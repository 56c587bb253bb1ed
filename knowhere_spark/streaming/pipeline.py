"""Streaming corpus curation — the batch hygiene chain
(operators/pipeline.curate_corpus's quality/repetition tier) applied to a
document STREAM, ending in the stateful first-seen dedup.

The stateless stages (quality features, Gopher repetition fractions) are
the SAME native column expressions as batch — they evaluate per-row, so
Structured Streaming runs them unchanged inside each micro-batch; only
dedup needs keyed state (streaming/dedup.stream_dedup_first_seen).  A
100 TB ingest therefore curates at scan speed per micro-batch with state
proportional to distinct content hashes, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.streaming.dedup import stream_dedup_first_seen


def stream_curate(
    docs: DataFrame,
    *,
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.3,
    max_top_2gram_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-gate → repetition-gate → first-seen exact dedup over a
    streaming documents frame.  Emits ``(group_key, doc_id)`` for each
    surviving canonical document (append mode), exactly the batch chain's
    keep-set: a doc passes iff it passes the same native gates AND is the
    first occurrence of its normalized content hash."""
    from knowhere_spark.functions.text import (
        quality_features_expr,
        repetition_features_expr,
    )

    q = quality_features_expr(F.col(text_col))
    r = repetition_features_expr(F.col(text_col))
    gated = docs.filter(
        (q["n_tokens"] >= min_tokens)
        & (r["dup_line_frac"] <= max_dup_line_frac)
        & (r["top_2gram_frac"] <= max_top_2gram_frac)
    )
    return stream_dedup_first_seen(gated, id_col=id_col, text_col=text_col)
