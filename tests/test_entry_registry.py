"""Driver-gate registry discipline (no Spark session needed).

The driver evaluates at most 50 ``queries()`` entries in dict order —
CORRECTNESS_r02 silently truncated a 56-entry registry, dropping six
components' gates.  These guards keep the registry inside the budget with
every oracle-bearing entry guaranteed a row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def test_registry_fits_driver_budget():
    assert len(entry.queries()) <= 50


def test_oracle_entries_precede_rows_only():
    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())
    first_rows_only = next((i for i, k in enumerate(qs) if k not in oracles), len(qs))
    # every entry past the first rows-only one must also be rows-only
    trailing = qs[first_rows_only:]
    assert all(k not in oracles for k in trailing), (
        "oracle-bearing entries must come first so the driver's budget "
        "cannot truncate a hash gate"
    )


def test_every_oracle_has_a_query():
    qs = set(entry.queries())
    dangling = [k for k in entry.oracle_sql() if k not in qs]
    assert dangling == []


def test_oracle_sql_mentions_only_registered_tables():
    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in entry.oracle_sql().items():
        low = sql.lower()
        assert any(t in low for t in tables), f"{name}: no known table referenced"
