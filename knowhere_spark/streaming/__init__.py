"""Structured Streaming surface — the *_CC search-while-insert analog
(SURVEY.md §2.5) and streaming event operators."""

from knowhere_spark.streaming.cc import GrowingIVFIndex
from knowhere_spark.streaming.events import run_available_now, stream_window_agg

__all__ = ["GrowingIVFIndex", "run_available_now", "stream_window_agg"]
