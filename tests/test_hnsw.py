"""HNSW graph build + BFS-beam batch search — recall vs exact oracle
(ANN floor 0.6, test_search.cc:28) and graph-shape invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.config import HnswConfig
from knowhere_spark.operators.hnsw import HNSWIndex

from conftest import QUERY_SCHEMA, dense_df, gen_dense, np_knn, recall_at_k


def test_hnsw_recall_l2(spark):
    nb, dim, nq, k = 1000, 32, 10, 10
    base = gen_dense(nb, dim, seed=31)
    qs = gen_dense(nq, dim, seed=32)
    idx = HNSWIndex.build(
        dense_df(spark, base), HnswConfig(metric_type="L2", M=16, ef=32)
    )
    # graph shape: <= M out-edges per node, no self-edges
    deg = idx.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg <= 16
    assert idx.edges.filter(F.col("src") == F.col("dst")).count() == 0

    res = idx.search(dense_df(spark, qs, QUERY_SCHEMA), k=k, ef=32, max_hops=4)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))
    truth = np_knn(base, qs, k, "L2")
    assert recall_at_k(got, truth, k) >= 0.6
