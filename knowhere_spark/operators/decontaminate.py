"""Benchmark decontamination: flag/remove training documents that overlap
an evaluation set by exact token n-gram collision.

The standard pre-training hygiene pass (the n-gram-overlap protocol of the
GPT-3/PaLM appendices): a training document is *contaminated* when a
sufficient number — or fraction — of its token n-grams also appear in any
benchmark document.  This extends the reference engine's scope per the
build brief (its API stops at search; a 100 TB training pipeline runs this
right after dedup).

Scale shape: the benchmark side is always tiny relative to the corpus
(MBs of eval sets vs TBs of training text), so its distinct-gram set is
**broadcast** (forced hint — provably bounded by the benchmark); the
corpus side explodes its grams map-side and hash-joins against the
broadcast set with no corpus shuffle on gram.  The hit/dirty sides are
bounded by *contamination*, not the benchmark, so they carry NO forced
hint: on a typical corpus AQE broadcasts them at runtime (one corpus
scan + one shuffle of the hit rows), while a heavily contaminated corpus
degrades to an ordinary shuffled join instead of a driver-OOMing forced
broadcast.

Tokenization/shingling reuses :mod:`knowhere_spark.functions.text`
(``tokens_expr``/``shingles_expr``), so the semantics are engine-portable
and oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.functions.text import shingles_expr


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination statistics vs the benchmark gram set.

    Returns ``(id_col, n_grams, n_hit_grams, contamination)`` for **every**
    document with at least one n-gram (``n_hit_grams`` = how many of its
    distinct token ``n``-grams appear anywhere in ``benchmark``,
    ``contamination`` = ``n_hit_grams / n_grams`` in [0, 1]).  Documents
    shorter than ``n`` tokens produce one truncated shingle (the whole
    token stream), matching ``shingles_expr``'s edge semantics, so short
    exact copies of benchmark rows are still caught.
    """
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(shingles_expr(F.col(bench_text), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col(text_col), n)).alias("gram"),
    )
    # distinct per doc already (shingles_expr distincts); broadcast the
    # benchmark set so the corpus never shuffles on gram
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    totals = docs.select(
        F.col(id_col),
        F.size(shingles_expr(F.col(text_col), n)).cast("long").alias("n_grams"),
    )
    # the hit side is bounded by the number of contaminated docs, which is
    # usually tiny but CAN approach corpus size on a dirty corpus — no
    # forced broadcast; AQE converts to broadcast when it is actually small
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("long").alias("n_hit_grams"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce(F.col("n_hit_grams"), F.lit(0)) / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("contamination"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    max_contamination: float = 0.0,
    min_hit_grams: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """``docs`` minus contaminated rows.

    A row is dropped when ``n_hit_grams >= min_hit_grams`` AND
    ``contamination > max_contamination`` (defaults: any overlap at all
    drops the row — the conservative eval-hygiene setting).  Implemented
    as a broadcast-gram hit test + a dirty-id anti-join; the dirty side is
    contamination-sized, so the broadcast decision is left to AQE (the
    corpus avoids shuffling whenever the dirty set is actually small).
    """
    report = contamination_report(
        docs, benchmark, n=n, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col,
    )
    dirty = report.filter(
        (F.col("n_hit_grams") >= min_hit_grams)
        & (F.col("contamination") > max_contamination)
    ).select(id_col)
    # anti-join on the dirty-id set; sized by contamination, so leave the
    # broadcast decision to AQE rather than forcing a possibly-corpus-sized
    # broadcast on a heavily contaminated corpus
    return docs.join(dirty, id_col, "left_anti")
