"""Result-quality metrics — the reference's recall utilities
(tests/ut/utils.h:110-135 ``GetKNNRecall``, utils.h:214-244
``GetRangeSearchRecall``) as public DataFrame operators, plus pair-set
precision/recall for the dedup family.

All three reduce to ONE aggregation over a (left-)semi-joined pair of
long-form result frames — no collect of either result set, so they run
at evaluation-corpus scale (the reference computes them in-memory over
nq x k arrays; long-form frames are this engine's equivalent shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(df: DataFrame, q: str = "query_id", n: str = "neighbor_id") -> DataFrame:
    # distinct: a duplicated pair (e.g. a pre-reduction union of shard
    # partials) must count once, never push recall past 1.0
    return df.select(
        F.col(q).alias("query_id"), F.col(n).alias("neighbor_id")
    ).distinct()


def knn_recall(result: DataFrame, ground_truth: DataFrame, k: int) -> float:
    """``|result@k ∩ truth@k| / (nq · k)`` — GetKNNRecall
    (utils.h:110-135): BOTH sides truncate to each query's top ``k``
    (rank column if present, else assumed pre-truncated), matched as an
    id SET per query.  Queries absent from ``result`` contribute zero
    matches, exactly like the reference's fixed-nq loop."""
    gt = ground_truth
    if "rank" in gt.columns:
        gt = gt.filter(F.col("rank") <= k)
    gt = _pairs(gt)
    res = result
    if "rank" in res.columns:
        res = res.filter(F.col("rank") <= k)
    nq = gt.select("query_id").distinct().count()
    if nq == 0:
        return 1.0
    matched = _pairs(res).join(
        gt, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    return matched / float(nq * k)


def range_search_recall(result: DataFrame, ground_truth: DataFrame) -> float:
    """``|result ∩ truth| / |truth|`` over (query, neighbor) pairs —
    GetRangeSearchRecall (utils.h:214-244), incl. its both-empty = 1.0
    convention."""
    gt = _pairs(ground_truth)
    total = gt.count()
    if total == 0:
        return 1.0 if _pairs(result).count() == 0 else 0.0
    matched = _pairs(result).join(
        gt, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    return matched / float(total)


def pair_metrics(
    found: DataFrame,
    truth: DataFrame,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> dict[str, float]:
    """Precision/recall/F1 of an unordered pair set (dedup evaluation:
    ``found`` = an approximate operator's pairs, ``truth`` = the exact
    operator's).  Pairs canonicalize to (min, max) so orientation never
    miscounts."""
    def canon(df):
        a, b = F.col(a_col), F.col(b_col)
        return df.select(
            F.least(a, b).alias("pa"), F.greatest(a, b).alias("pb")
        ).distinct()

    f, t = canon(found), canon(truth)
    n_f, n_t = f.count(), t.count()
    tp = f.join(t, ["pa", "pb"], "left_semi").count()
    precision = tp / n_f if n_f else 1.0
    recall = tp / n_t if n_t else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1,
            "found": float(n_f), "truth": float(n_t), "matched": float(tp)}
