"""Local replica of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry in Spark and its ``oracle_sql()`` in
DuckDB at sf0.01, compare row count + order-insensitive values.

Usage:  python tools/check_oracle.py [sf_dir] [only_query_name...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from knowhere_spark.sources.tables import TABLES


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr-level, like the driver's hash: float equality would hide
        # sign-of-zero divergence (-0.0 == 0.0 but hashes differently) —
        # exactly the gap that let the r12 int8 codec mirror slip through
        return repr(round(v, 6))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        orel = con.execute(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        s_norm = _norm_rows(scols, [[r[c] for c in scols] for r in srows])
        o_norm = _norm_rows(ocols, orows)
        ok = s_norm == o_norm
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} spark={len(srows)} duck={len(orows)} cols_s={sorted(scols)} cols_d={sorted(ocols)}")
        if not ok:
            failures += 1
            sset, oset = set(s_norm), set(o_norm)
            for r in list(sset - oset)[:3]:
                print(f"   spark-only: {r}")
            for r in list(oset - sset)[:3]:
                print(f"   duck-only:  {r}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
