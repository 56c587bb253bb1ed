"""Hybrid-search result fusion — combining a dense ANN result with a
sparse/BM25 result for the same queries (the standard two-retriever
setup this engine's FLAT/IVF/HNSW + SPARSE families feed; Milvus exposes
the same two rankers on top of the reference as RRFRanker /
WeightedRanker, and both formulas are public literature — RRF is
Cormack et al. 2009).

Both fusers are pure DataFrame ops: a full outer join per result list on
(query_id, neighbor_id), one final top-k window — no UDFs, no collect;
the inputs are already top-k-sized (nq x k rows each), so every join
side is small relative to the corpora that produced them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowhere_spark.operators.topk import topk_per_key


def _ranked(df: DataFrame, tag: str) -> DataFrame:
    """Normalize one result list to (query_id, neighbor_id, rank_<tag>,
    score_<tag>).  A missing ``rank`` column is derived from the list's
    own score ordering (higher = better, the similarity convention;
    distance-metric callers should pass their existing rank column)."""
    if "rank" in df.columns:
        return df.select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias(f"rank_{tag}"),
        )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("distance").desc(), F.col("neighbor_id")
        )
    )
    return df.select("query_id", "neighbor_id", "distance").withColumn(
        f"rank_{tag}", w.cast("long")
    ).drop("distance")


def rrf_fuse(
    results: list[DataFrame],
    k: int,
    *,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion: ``score = Σ_lists 1/(rrf_k + rank)`` over
    each list containing the (query, neighbor) pair; absent lists simply
    contribute nothing.  Returns ``(query_id, neighbor_id, score, rank)``
    top-k per query, ties broken by neighbor_id (deterministic).

    Rank-based, so distance and similarity lists mix freely — each
    list's ``rank`` column already encodes its own metric direction."""
    if not results:
        raise ValueError("rrf_fuse needs at least one result list")
    fused = None
    for i, df in enumerate(results):
        part = _ranked(df, str(i)).select(
            "query_id", "neighbor_id",
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{i}"))).alias(f"c_{i}"),
        )
        fused = part if fused is None else fused.join(
            part, ["query_id", "neighbor_id"], "outer"
        )
    score = sum(
        (F.coalesce(F.col(f"c_{i}"), F.lit(0.0)) for i in range(len(results))),
        F.lit(0.0),
    )
    scored = fused.select("query_id", "neighbor_id", score.alias("score"))
    return topk_per_key(
        scored, "query_id", "score", k, ascending=False, tie_breaker="neighbor_id"
    )


def weighted_fuse(
    results: list[DataFrame],
    weights: list[float],
    k: int,
) -> DataFrame:
    """Weighted score fusion: per list, min-max-normalize scores WITHIN
    each query to [0, 1] (lists measure incomparable things — cosine vs
    BM25), then ``score = Σ w_i · norm_i``; pairs absent from a list get
    0 from it.  Returns top-k per query, deterministic tie-break.

    Uses each list's ``distance`` column as-is (similarity convention:
    higher = better).  Distance-metric inputs should be negated by the
    caller — the engine's L2 results order ascending."""
    if len(results) != len(weights):
        raise ValueError("one weight per result list")
    if not results:
        raise ValueError("weighted_fuse needs at least one result list")
    fused = None
    for i, df in enumerate(results):
        w = Window.partitionBy("query_id")
        part = (
            df.select(
                "query_id", "neighbor_id",
                F.col("distance").cast("double").alias("d"),
            )
            .withColumn(
                f"n_{i}",
                F.when(
                    F.max("d").over(w) > F.min("d").over(w),
                    (F.col("d") - F.min("d").over(w))
                    / (F.max("d").over(w) - F.min("d").over(w)),
                ).otherwise(F.lit(1.0)),
            )
            .select("query_id", "neighbor_id", f"n_{i}")
        )
        fused = part if fused is None else fused.join(
            part, ["query_id", "neighbor_id"], "outer"
        )
    score = sum(
        (
            F.lit(float(weights[i])) * F.coalesce(F.col(f"n_{i}"), F.lit(0.0))
            for i in range(len(results))
        ),
        F.lit(0.0),
    )
    scored = fused.select("query_id", "neighbor_id", score.alias("score"))
    return topk_per_key(
        scored, "query_id", "score", k, ascending=False, tie_breaker="neighbor_id"
    )
