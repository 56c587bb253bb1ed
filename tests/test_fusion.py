"""Hybrid fusion (operators/fusion.py): RRF hand-computed, weighted
min-max fusion, determinism, real dense+sparse composition."""

import pytest
from pyspark.sql import functions as F

from knowhere_spark.operators.fusion import rrf_fuse, weighted_fuse


def _hits(spark, rows):
    # (query_id, neighbor_id, distance, rank)
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, distance double, rank int"
    )


def test_rrf_hand_computed(spark):
    a = _hits(spark, [(1, 10, 0.9, 1), (1, 11, 0.8, 2), (1, 12, 0.7, 3)])
    b = _hits(spark, [(1, 11, 5.0, 1), (1, 13, 4.0, 2)])
    out = {r.neighbor_id: r for r in rrf_fuse([a, b], k=4, rrf_k=60).collect()}
    # 11: 1/62 + 1/61 ; 10: 1/61 ; 13: 1/62 ; 12: 1/63
    assert out[11].rank == 1
    assert abs(out[11].score - (1 / 62 + 1 / 61)) < 1e-12
    assert out[10].rank == 2 and abs(out[10].score - 1 / 61) < 1e-12
    assert out[13].rank == 3 and out[12].rank == 4


def test_rrf_rank_derived_from_scores_when_missing(spark):
    a = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8)], "query_id long, neighbor_id long, distance double"
    )
    out = rrf_fuse([a], k=2).collect()
    by = {r.neighbor_id: r.rank for r in out}
    assert by == {10: 1, 11: 2}


def test_rrf_deterministic_ties(spark):
    # same single list twice: all scores double, ordering preserved; ties
    # between neighbors with equal score break by neighbor_id
    a = _hits(spark, [(1, 20, 0.5, 1), (1, 21, 0.5, 1)])
    out = rrf_fuse([a], k=2).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [20, 21]


def test_weighted_fuse_hand_computed(spark):
    dense = _hits(spark, [(1, 10, 1.0, 1), (1, 11, 0.5, 2), (1, 12, 0.0, 3)])
    sparse = _hits(spark, [(1, 11, 8.0, 1), (1, 10, 4.0, 2), (1, 13, 0.0, 3)])
    out = {r.neighbor_id: r.score for r in weighted_fuse([dense, sparse], [0.7, 0.3], k=4).collect()}
    # dense norms: 10->1, 11->0.5, 12->0 ; sparse norms: 11->1, 10->0.5, 13->0
    assert abs(out[10] - (0.7 * 1.0 + 0.3 * 0.5)) < 1e-12
    assert abs(out[11] - (0.7 * 0.5 + 0.3 * 1.0)) < 1e-12
    assert abs(out[12] - 0.0) < 1e-12 and abs(out[13] - 0.0) < 1e-12


def test_weighted_fuse_constant_scores_normalize_to_one(spark):
    a = _hits(spark, [(1, 10, 3.0, 1), (1, 11, 3.0, 2)])
    out = {r.neighbor_id: r.score for r in weighted_fuse([a], [1.0], k=2).collect()}
    assert out == {10: 1.0, 11: 1.0}


def test_validation(spark):
    a = _hits(spark, [(1, 10, 1.0, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([], k=3)
    with pytest.raises(ValueError):
        weighted_fuse([a], [0.5, 0.5], k=3)


def test_real_dense_plus_sparse_composition(spark):
    """End-to-end: FLAT cosine hits + sparse IP hits over toy corpora
    fuse into one ranking containing both modalities' winners."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.brute_force import BruteForce
    from knowhere_spark.operators.sparse import SparseInvertedIndex

    base = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "id long, vec array<float>",
    )
    q = spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], "query_id long, vec array<float>")
    dense = BruteForce.search(base, q, 2, "COSINE")
    docs = spark.createDataFrame(
        [(0, {1: 1.0}), (1, {1: 1.0, 2: 2.0}), (2, {3: 1.0})],
        "doc_id long, features map<int,float>",
    )
    idx = SparseInvertedIndex.build(
        docs, SparseConfig(metric_type="IP"), id_col="doc_id", vec_col="features"
    )
    sq = spark.createDataFrame([(1, {2: 1.0})], "query_id long, features map<int,float>")
    sparse = idx.search(sq, k=2, query_vec_col="features").select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.col("score").alias("distance"),
        "rank",
    )
    fused = rrf_fuse([dense, sparse], k=3).collect()
    ids = {r.neighbor_id for r in fused}
    assert 0 in ids          # dense winner (exact match on dim 0)
    assert 1 in ids          # sparse winner (term 2)
