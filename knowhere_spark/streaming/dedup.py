"""Streaming exact-dedup — the stateful streaming member of the dedup
family (operators/dedup.exact_duplicates is the batch form).

A training-data ingest stream wants each document exactly once, with
duplicates suppressed ACROSS micro-batches — state that outlives any
window, which is precisely the ``applyInPandasWithState`` contract
(Spark's arbitrary-stateful-processing API; the escape hatch for
operators the built-in windowed aggregations can't express).

State per ``group_key`` is a single seen-count; the first row of a key
ever observed is emitted, every later arrival (same batch or any later
batch) is dropped and counted.  At 100 TB-scale ingest the state store is
keyed by the content hash — O(distinct docs) tiny fixed-size entries,
partitioned by Spark's state-store sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: emitted row: the first-seen doc for the key
_OUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("doc_id", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def stream_dedup_first_seen(
    events: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """First-seen filter over a document stream: emits
    ``(group_key, doc_id)`` for the first occurrence of each normalized
    content hash; duplicates across micro-batches are suppressed by the
    keyed state store.  Keying mirrors the batch operator
    (operators/dedup.exact_duplicates): md5 over the token stream when
    ``normalized``, raw text otherwise.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.functions.text import tokens_expr

    key = (
        F.md5(F.concat_ws(" ", tokens_expr(F.col(text_col))))
        if normalized
        else F.md5(F.col(text_col))
    )
    keyed = events.select(
        key.alias("group_key"), F.col(id_col).cast("long").alias("doc_id")
    )

    def fn(key_tuple, pdfs, state):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        first = None
        n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if seen == 0 and first is None:
                # min doc_id in this batch = the canonical row, matching
                # the batch operator's is_canonical tie-break
                first = pdf.nsmallest(1, "doc_id")[["group_key", "doc_id"]]
            n += len(pdf)
        state.update((seen + n,))
        if seen == 0 and first is not None:
            yield first

    return keyed.groupBy("group_key").applyInPandasWithState(
        fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
