"""Event-stream operators over the ``events`` table: tumbling-window
aggregation and gap-based sessionization.

These are the batch expressions of the engine's streaming surface
(knowhere_spark.streaming runs the same logical plans incrementally with
watermarks); keeping them as pure DataFrame transformations means one
definition serves both batch backfill and the live stream — the classic
kappa pattern, and the Spark analog of the reference's *_CC
search-while-insert indexes (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_agg(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window counts + sums per key.

    Returns ``(window_start TIMESTAMP, <key>, n_events, sum_value)``.
    The same expression runs under ``readStream`` with
    ``withWatermark`` for the streaming path.
    """
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds ``gap_minutes``.

    Returns ``(user_id, session_id, n_events, session_start, session_end)``
    with ``session_id`` numbered 1..n per user in time order.  The lag +
    running-sum-of-boundaries window idiom — one shuffle on user_id.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    # unix_micros requires TIMESTAMP; parquet event tables may carry
    # TIMESTAMP_NTZ, so normalize once and lag the normalized column.
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = F.lag(micros).over(w)
    # microsecond-exact gap comparison (event timestamps carry sub-second parts)
    is_new = (
        gap.isNull() | (micros - gap > gap_minutes * 60 * 1_000_000)
    ).cast("int")
    sessions = events.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w)
    )
    return sessions.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
