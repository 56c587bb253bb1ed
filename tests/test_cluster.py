"""KMeans cluster op — reference protocol (tests/ut/test_cluster.cc:29,37-47):
assign queries to nearest centroid; cluster-recall@1 >= 0.80 with 8 clusters."""

from __future__ import annotations

import numpy as np

from knowhere_spark.config import KMeansConfig
from knowhere_spark.operators.cluster import KMeansCluster

from tests.conftest import QUERY_SCHEMA, dense_df, gen_dense

NB, DIM, NQ = 1000, 32, 20


def test_kmeans_cluster_recall(spark):
    base = gen_dense(NB, DIM, seed=42)
    queries = gen_dense(NQ, DIM, seed=43)
    base_df = dense_df(spark, base)
    query_df = dense_df(spark, queries, QUERY_SCHEMA).withColumnRenamed("query_id", "id")

    cfg = KMeansConfig(num_clusters=8)
    cl = KMeansCluster.train(base_df, cfg)
    assert cl.centroids.shape == (8, DIM)

    mapping = {r["id"]: r["cluster_id"] for r in cl.train_mapping.collect()}
    assert len(mapping) == NB and set(mapping.values()) <= set(range(8))

    assigned = {r["id"]: r["cluster_id"] for r in cl.assign(query_df).collect()}
    # oracle: nearest centroid by L2 in numpy
    d = ((queries.astype(np.float64)[:, None, :] - cl.centroids[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    hits = sum(1 for i in range(NQ) if assigned[i] == want[i])
    assert hits / NQ >= 0.80   # test_cluster.cc:29 floor (ours is exact argmin → 1.0)
    assert hits == NQ

    # train-set coherence: each point's own cluster is the nearest centroid
    # for >= 80% of points (kmeans converged reasonably)
    d_base = ((base.astype(np.float64)[:, None, :] - cl.centroids[None, :, :]) ** 2).sum(axis=2)
    base_nearest = d_base.argmin(axis=1)
    agree = sum(1 for i in range(NB) if mapping[i] == base_nearest[i])
    assert agree / NB >= 0.99


def test_get_centroids(spark):
    base = gen_dense(200, 16, seed=42)
    cl = KMeansCluster.train(dense_df(spark, base), KMeansConfig(num_clusters=4))
    rows = cl.get_centroids(spark).collect()
    assert len(rows) == 4
    got = {r["cluster_id"]: r["vec"] for r in rows}
    for i in range(4):
        assert np.allclose(got[i], cl.centroids[i])
