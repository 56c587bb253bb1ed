"""LSH bucketed cosine: planted near-duplicates must be recovered
(candidate recall from OR-amplification, precision 1.0 from exact
re-scoring) and ANN search must find planted neighbors."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.operators.dedup import embedding_neardup_pairs
from knowhere_spark.operators.lsh import LshIndex

from conftest import DENSE_SCHEMA, QUERY_SCHEMA, dense_df, gen_dense


def _planted(nb=300, dim=32, n_dups=30, seed=81):
    """Base + near-duplicate rows (tiny perturbation → cosine ≈ 1)."""
    rng = np.random.default_rng(seed)
    base = gen_dense(nb, dim, seed=seed) - 50.0
    dups = base[:n_dups] + rng.standard_normal((n_dups, dim)) * 0.01
    return np.vstack([base, dups]).astype(np.float32), nb, n_dups


def test_lsh_neardup_matches_exact(spark):
    mat, nb, n_dups = _planted()
    df = dense_df(spark, mat)
    idx = LshIndex.build(df, dim=32, n_bits=10, n_tables=12)
    got = {
        (r["id_a"], r["id_b"]) for r in idx.neardup_pairs(0.999).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, 0.999).collect()
    }
    planted = {(i, nb + i) for i in range(n_dups)}
    assert planted <= want                      # sanity: the plant worked
    assert got <= want                          # precision 1.0 (exact verify)
    assert len(got & planted) / n_dups >= 0.9   # recall on planted dups


def test_lsh_search_finds_planted_neighbor(spark):
    mat, nb, n_dups = _planted()
    df = dense_df(spark, mat)
    idx = LshIndex.build(df, dim=32, n_bits=10, n_tables=12)
    queries = dense_df(spark, mat[:10], QUERY_SCHEMA)   # their dups exist at nb+i
    res = idx.search(queries, k=2)
    top = {}
    for r in res.collect():
        top.setdefault(r["query_id"], []).append(r["neighbor_id"])
    hits = sum(1 for q in range(10) if nb + q in top.get(q, []))
    assert hits >= 9   # the near-duplicate is found for >= 90% of queries