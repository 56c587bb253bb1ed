"""Planner: brute-force fallback thresholds (IndexConditionalWrapper.h:27-29)
and ensure-topk nprobe widening (ivf.cc:753-762)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowhere_spark.config import IvfConfig
from knowhere_spark.operators.ivf import IVFFlatIndex
from knowhere_spark.plans.planner import (
    decide_search_plan,
    search_widening,
    search_with_fallback,
)

from conftest import QUERY_SCHEMA, dense_df, gen_dense, np_knn, recall_at_k


def test_decision_rules():
    # k >= 0.5 n → BF
    assert decide_search_plan(100, 50).use_brute_force
    assert not decide_search_plan(100, 49).use_brute_force
    # filter ratio >= 0.93 (KNN) / 0.97 (range)
    assert decide_search_plan(1000, 5, n_alive=70).use_brute_force
    assert not decide_search_plan(1000, 5, n_alive=80).use_brute_force
    assert decide_search_plan(1000, 5, n_alive=30, is_range=True).use_brute_force
    assert not decide_search_plan(1000, 5, n_alive=40, is_range=True).use_brute_force
    # k >= 0.5 * alive → BF even under moderate filters
    assert decide_search_plan(1000, 60, n_alive=100).use_brute_force
    # empty index
    assert decide_search_plan(0, 1).use_brute_force


def test_fallback_is_exact_under_heavy_filter(spark):
    nb, dim, nq, k = 500, 16, 5, 5
    base = gen_dense(nb, dim, seed=41)
    qs = gen_dense(nq, dim, seed=42)
    idx = IVFFlatIndex.build(
        dense_df(spark, base), IvfConfig(metric_type="L2", nlist=16, nprobe=2)
    )
    # keep only ids % 20 == 0 → 95% filtered out → BF branch
    flt = F.col("id") % 20 == 0
    out, decision = search_with_fallback(
        idx, dense_df(spark, qs, QUERY_SCHEMA), k, filter_expr=flt
    )
    assert decision.use_brute_force
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))
    # exact truth over the filtered subset
    keep = [i for i in range(nb) if i % 20 == 0]
    truth = np_knn(base[keep], qs, k, "L2")
    remap = {q: [(keep[i], d) for i, d in v] for q, v in truth.items()}
    assert recall_at_k(got, remap, k) == 1.0   # fallback is exact

    # no filter, small k → index branch
    out2, decision2 = search_with_fallback(idx, dense_df(spark, qs, QUERY_SCHEMA), k)
    assert not decision2.use_brute_force


def test_nprobe_widening_fills_k(spark):
    nb, dim, nq, k = 400, 8, 4, 10
    base = gen_dense(nb, dim, seed=43)
    qs = gen_dense(nq, dim, seed=44)
    idx = IVFFlatIndex.build(
        dense_df(spark, base),
        IvfConfig(metric_type="L2", nlist=16, nprobe=1, ensure_topk_full=False),
    )
    # heavy filter: only 30 rows alive → nprobe=1 will underfill some queries
    flt = F.col("id") < 30
    out = search_widening(
        idx, dense_df(spark, qs, QUERY_SCHEMA), k, filter_expr=flt
    )
    counts = {r["query_id"]: r["cnt"] for r in
              out.groupBy("query_id").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == set(range(nq))
    assert all(c == k for c in counts.values())   # 30 alive >= k=10
