"""Physical-plan selection — the engine's (only) planning layer.

The reference has no plan rewriter; its optimizations are hard-coded
physical heuristics (SURVEY.md §4).  Catalyst supplies pushdown/pruning
for free; what remains engine-specific is *which search plan to run*:

1. **Brute-force fallback** (src/index/hnsw/impl/IndexConditionalWrapper.cc:31-91,
   thresholds IndexConditionalWrapper.h:27-29): skip the ANN structure when
   - ``k >= 0.5 * n_alive``            (kHnswSearchBFTopkThreshold), or
   - ``filtered_out/n >= 0.93``        (KNN;   kHnswSearchKnnBFFilterThreshold)
   - ``filtered_out/n >= 0.97``        (range; kHnswSearchRangeBFFilterThreshold)
   An exhaustive scan of the few surviving rows is cheaper *and* exact.

2. **ensure-topk widening** (ivf.cc:753-762): when a probe-limited search
   underfills k, re-run with a wider probe — generic driver loop here,
   doubling nprobe up to nlist.

Selectivity comes from a cheap count (or caller-provided estimate) — at
100 TB you'd feed this from table stats instead; the decision logic is
the same.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowhere_spark.operators.brute_force import BruteForce

# IndexConditionalWrapper.h:27-29
KNN_BF_FILTER_THRESHOLD = 0.93
RANGE_BF_FILTER_THRESHOLD = 0.97
BF_TOPK_THRESHOLD = 0.5


@dataclass
class PlanDecision:
    use_brute_force: bool
    reason: str
    n_total: int
    n_alive: int


def decide_search_plan(
    n_total: int,
    k: int,
    *,
    n_alive: int | None = None,
    is_range: bool = False,
) -> PlanDecision:
    """Pure decision function — WhetherPerformBruteForceSearch
    (IndexConditionalWrapper.cc:31-62) with the same three rules."""
    n_alive = n_total if n_alive is None else n_alive
    if n_total <= 0:
        return PlanDecision(True, "empty index", n_total, n_alive)
    if k >= n_total * BF_TOPK_THRESHOLD:
        return PlanDecision(
            True, f"k={k} >= {BF_TOPK_THRESHOLD} * n={n_total}", n_total, n_alive
        )
    filtered_out = n_total - n_alive
    threshold = RANGE_BF_FILTER_THRESHOLD if is_range else KNN_BF_FILTER_THRESHOLD
    if filtered_out >= n_total * threshold:
        return PlanDecision(
            True,
            f"filter removes {filtered_out}/{n_total} >= {threshold}",
            n_total,
            n_alive,
        )
    if k >= n_alive * BF_TOPK_THRESHOLD:
        return PlanDecision(
            True, f"k={k} >= {BF_TOPK_THRESHOLD} * alive={n_alive}", n_total, n_alive
        )
    return PlanDecision(False, "index search", n_total, n_alive)


def search_with_fallback(
    index,
    query_df: DataFrame,
    k: int,
    *,
    filter_expr: Column | str | None = None,
    base_df: DataFrame | None = None,
    nprobe: int | None = None,
) -> tuple[DataFrame, PlanDecision]:
    """ANN search guarded by the brute-force fallback rules.

    ``index`` is any built index exposing ``.assignments``/``.base``-style
    raw rows and ``.search``; ``base_df`` overrides where the raw vectors
    live (required for indexes without raw data, e.g. IVF_PQ).
    """
    raw = base_df
    if raw is None:
        # probe the index families' raw-vector homes; a codes-only
        # .assignments (quantized IVF without raw data) must NOT match,
        # so candidates are accepted only when they carry a vec column
        sq = getattr(index, "sq", None)          # SCANN refine source
        graph = getattr(index, "graph", None)    # quantized-HNSW raw graph
        for cand in (
            getattr(index, "assignments", None),
            getattr(index, "base", None),
            getattr(index, "vectors", None),     # HNSW family raw table
            getattr(sq, "assignments", None) if sq is not None else None,
            getattr(graph, "vectors", None) if graph is not None else None,
        ):
            if cand is not None and "vec" in cand.columns:
                raw = cand
                break
    if raw is None:
        raise ValueError("no raw-vector table available; pass base_df")
    raw = raw.select("id", "vec")

    n_total = raw.count()
    n_alive = raw.filter(filter_expr).count() if filter_expr is not None else n_total
    decision = decide_search_plan(n_total, k, n_alive=n_alive)

    if decision.use_brute_force:
        out = BruteForce.search(
            raw, query_df, k, index.config.metric_type, filter_expr=filter_expr
        )
    else:
        out = index.search(query_df, k, filter_expr=filter_expr, **(
            {"nprobe": nprobe} if nprobe is not None else {}
        ))
    return out, decision


def search_widening(
    index,
    query_df: DataFrame,
    k: int,
    *,
    start_nprobe: int | None = None,
    **kw,
) -> DataFrame:
    """ensure_topk_full as a generic driver loop (ivf.cc:753-762): double
    nprobe until every query has k results or the probe covers all cells."""
    nlist = index.config.nlist
    nprobe = start_nprobe or index.config.nprobe
    nq = query_df.count()   # loop-invariant
    while True:
        out = index.search(query_df, k, nprobe=min(nprobe, nlist), **kw)
        if nprobe >= nlist:
            return out
        out = out.cache()   # one probe scan serves the check AND the caller
        # one aggregation answers both exit conditions: every query present
        # and none underfilled
        stats = (
            out.groupBy("query_id")
            .agg(F.count("*").alias("cnt"))
            .agg(
                F.count("*").alias("n_queries"),
                F.sum(F.when(F.col("cnt") < k, 1).otherwise(0)).alias("under"),
            )
            .first()
        )
        if stats["under"] == 0 and stats["n_queries"] == nq:
            # hand the caller an UNcached result: pin the rows via an eager
            # localCheckpoint, then release the cache — otherwise the result
            # set stays pinned for the session lifetime on every successful
            # widened search (callers cannot know it was cached)
            final = out.localCheckpoint(eager=True)
            out.unpersist()
            return final
        out.unpersist()
        nprobe *= 2
