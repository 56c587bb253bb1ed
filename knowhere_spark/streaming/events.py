"""Streaming expressions of the event operators — the same logical plans
as operators/events.py run incrementally under Structured Streaming
(SURVEY.md §2.5: the reference's only streaming-adjacent surface is the
*_CC search-while-insert family; event-time windowing is the
training-pipeline extension).

One definition serves batch and stream: ``window_agg`` here applies the
identical groupBy-window expression, adding only the watermark (late-data
bound) that batch doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_window_agg(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per key over a streaming
    DataFrame.  Output schema matches operators.events.window_agg, so the
    memory-sink result of a run is directly comparable to the batch
    expression over the same input — the test strategy for every
    streaming operator here.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def stream_sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions over a stream via native ``session_window`` —
    Spark's built-in merging session state, the idiomatic replacement for
    a hand-rolled ``applyInPandasWithState`` operator (the escape hatch
    remains for logic session_window can't express).

    Output ``(user_id, n_events, session_start, session_end)`` where
    ``session_end`` is the last event's time — comparable to the batch
    ``operators.events.sessionize`` (whose window.end would be
    ``last_ts + gap``).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
            F.col(user_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(user_col, "n_events", "session_start", "session_end")
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint: str, *, output_mode: str = "complete"
):
    """Drain a bounded stream into a memory sink with the availableNow
    trigger; returns the finished StreamingQuery (results at
    ``SELECT * FROM <query_name>``).  ``complete`` mode emits every
    window, closed or not — right for bounded-input equivalence tests;
    use ``append`` to observe only watermark-finalized windows."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
