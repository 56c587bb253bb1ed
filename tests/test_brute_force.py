"""BruteForce search vs numpy oracle — the reference's core test pattern
(tests/ut/test_search.cc: brute-force recall floor 0.95; ours is exact so
we require exact id-set match per query)."""

from __future__ import annotations

import numpy as np
import pytest

from knowhere_spark.config import BaseConfig, MetricType
from knowhere_spark.operators.brute_force import BruteForce

from tests.conftest import (
    QUERY_SCHEMA,
    dense_df,
    gen_dense,
    np_distances,
    np_knn,
)

NB, DIM, NQ, K = 500, 32, 8, 10


@pytest.fixture(scope="module")
def data(spark):
    base = gen_dense(NB, DIM, seed=42)
    queries = gen_dense(NQ, DIM, seed=43)
    base_df = dense_df(spark, base)
    query_df = dense_df(spark, queries, QUERY_SCHEMA)
    return base, queries, base_df, query_df


def _collect(df):
    out = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))
    return out


@pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
@pytest.mark.parametrize("strategy", ["sql", "gemm"])
def test_knn_exact(data, metric, strategy):
    base, queries, base_df, query_df = data
    res = _collect(
        BruteForce.search(base_df, query_df, K, metric, strategy=strategy)
    )
    truth = np_knn(base, queries, K, metric)
    assert set(res) == set(range(NQ))
    for q in range(NQ):
        got_ids = [i for i, _ in res[q]]
        want_ids = [i for i, _ in truth[q]]
        assert got_ids == want_ids, f"metric={metric} q={q}"
        for (_, gd), (_, wd) in zip(res[q], truth[q]):
            assert gd == pytest.approx(wd, rel=1e-9)


def test_knn_k_larger_than_nb(data, spark):
    base, queries, base_df, query_df = data
    res = BruteForce.search(base_df.limit(5), query_df, K, "L2")
    counts = res.groupBy("query_id").count().collect()
    # fewer than k neighbors → absent rows, not -1 padding (SURVEY.md §1.1)
    assert all(r["count"] <= 5 for r in counts)


def test_knn_with_filter(data, spark):
    """BitsetView analog: filter excludes even ids (bitsetview.h:53-57)."""
    from pyspark.sql import functions as F

    base, queries, base_df, query_df = data
    res = _collect(
        BruteForce.search(
            base_df, query_df, K, "L2", filter_expr=F.col("id") % 2 == 1
        )
    )
    d = np_distances(base, queries, "L2")
    for q in range(NQ):
        ids = [i for i, _ in res[q]]
        assert all(i % 2 == 1 for i in ids)
        # oracle restricted to odd ids
        odd = np.arange(NB)[1::2]
        order = odd[np.lexsort((odd, d[odd, q]))]
        assert ids == [int(i) for i in order[:K]]


@pytest.mark.parametrize(
    "metric,radius,range_filter",
    [("L2", 50000.0, 0.0), ("COSINE", 0.78, 1.01), ("IP", 82000.0, None)],
)
def test_range_search(data, metric, radius, range_filter):
    """Directional range semantics (include/knowhere/range_util.h:22-25)."""
    base, queries, base_df, query_df = data
    cfg = BaseConfig(metric_type=metric, radius=radius, range_filter=range_filter)
    res = BruteForce.range_search(base_df, query_df, cfg).collect()
    d = np_distances(base, queries, metric)
    got = {(r["query_id"], r["neighbor_id"]) for r in res}
    lo, hi, sim = cfg.range_bounds()
    want = set()
    for q in range(NQ):
        for i in range(NB):
            v = d[i, q]
            ok = (lo < v <= hi) if sim else (lo <= v < hi)
            if ok:
                want.add((q, i))
    assert got == want
    assert len(want) > 0, "fixture radius too tight — test vacuous"


def test_range_search_k_truncation(data):
    base, queries, base_df, query_df = data
    cfg = BaseConfig(metric_type="L2", radius=1e9, range_search_k=3)
    res = BruteForce.range_search(base_df, query_df, cfg)
    counts = res.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_get_vector_by_ids(data, spark):
    base, queries, base_df, query_df = data
    ids_df = spark.createDataFrame([(3,), (7,), (11,)], "id long")
    got = {
        r["id"]: r["vec"]
        for r in BruteForce.get_vector_by_ids(base_df, ids_df).collect()
    }
    assert set(got) == {3, 7, 11}
    for i in got:
        assert np.allclose(got[i], base[i], rtol=1e-6)
