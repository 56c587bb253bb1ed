"""Structured Streaming surface — the *_CC search-while-insert analog
(SURVEY.md §2.5) and streaming event operators."""

from knowhere_spark.streaming.cc import GrowingIVFIndex
from knowhere_spark.streaming.dedup import (
    stream_dedup_first_seen,
    stream_neardup_minhash,
)
from knowhere_spark.streaming.events import run_available_now, stream_window_agg
from knowhere_spark.streaming.pipeline import stream_curate
from knowhere_spark.streaming.semdedup import stream_semdedup

__all__ = [
    "GrowingIVFIndex",
    "run_available_now",
    "stream_curate",
    "stream_dedup_first_seen",
    "stream_neardup_minhash",
    "stream_semdedup",
    "stream_window_agg",
]
