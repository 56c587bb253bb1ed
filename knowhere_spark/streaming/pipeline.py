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


def stream_corpus_stats(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Running corpus-health statistics over a document STREAM — the
    streaming twin of ``operators/pipeline.corpus_stats``, same columns
    (volume, length sketch, HLL dup estimate, language mix).

    Every statistic is a mergeable sketch or algebraic aggregate, so
    Structured Streaming keeps ONE state row and merges each micro-batch
    into it — a 100 TB ingest maintains live corpus health at scan speed
    with O(1) state.  Run with ``outputMode('complete')`` (the aggregate
    is global; there is no watermark to append by):

        q = (stream_corpus_stats(stream).writeStream.format("memory")
             .queryName("stats").outputMode("complete").start())
    """
    from knowhere_spark.functions.text import (
        fingerprint_expr,
        langid_expr,
        token_count_expr,
    )

    t = F.col(text_col)
    ntok = token_count_expr(t)
    lang = langid_expr(t)
    lang_cols = [
        F.sum(F.when(lang == code, 1).otherwise(0)).cast("long").alias(f"lang_{code}")
        for code in ("en", "de", "es", "fr", "unknown")
    ]
    return docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count(t).cast("long").alias("n_docs_with_text"),
        F.sum(ntok).cast("long").alias("n_tokens"),
        F.sum(F.length(t)).cast("long").alias("n_chars"),
        F.percentile_approx(ntok, 0.5).cast("long").alias("tokens_p50"),
        F.percentile_approx(ntok, 0.9).cast("long").alias("tokens_p90"),
        F.percentile_approx(ntok, 0.99).cast("long").alias("tokens_p99"),
        F.approx_count_distinct(fingerprint_expr(t)).alias("approx_distinct_docs"),
        *lang_cols,
    )
