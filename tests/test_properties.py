"""Property-based tests (hypothesis) for the numpy kernel layer — the
engine's equivalent of the reference's SIMD-kernel equivalence suites
(tests/ut/test_distances.cc, test_simd.cc): every fast path must agree
with the naive definition on arbitrary inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from knowhere_spark.config import MetricType
from knowhere_spark.functions.distance import (
    local_topk,
    numpy_kmeans,
    pairwise_distances,
)

_f = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


def _mats(max_n=12, max_q=6, max_d=8):
    return st.integers(2, max_n).flatmap(
        lambda n: st.integers(1, max_q).flatmap(
            lambda q: st.integers(1, max_d).flatmap(
                lambda d: st.tuples(
                    arrays(np.float64, (n, d), elements=_f),
                    arrays(np.float64, (q, d), elements=_f),
                )
            )
        )
    )


@settings(max_examples=60, deadline=None)
@given(_mats())
def test_pairwise_l2_matches_naive(xy):
    X, Q = xy
    got = pairwise_distances(X, Q, MetricType.L2)
    naive = ((X[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_allclose(got, naive, rtol=1e-9, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(_mats())
def test_pairwise_ip_matches_naive(xy):
    X, Q = xy
    got = pairwise_distances(X, Q, MetricType.IP)
    np.testing.assert_allclose(got, X @ Q.T, rtol=1e-9, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(_mats())
def test_pairwise_cosine_bounded_and_symmetric_in_scale(xy):
    X, Q = xy
    got = pairwise_distances(X, Q, MetricType.COSINE)
    assert got.shape == (len(X), len(Q))
    finite = np.isfinite(got)
    assert np.all(np.abs(got[finite]) <= 1.0 + 1e-9)
    # cosine is scale-invariant on the nonzero rows
    nz = (np.linalg.norm(X, axis=1) > 1e-6) & True
    if nz.any():
        got2 = pairwise_distances(X[nz] * 3.0, Q, MetricType.COSINE)
        np.testing.assert_allclose(got2, got[nz], rtol=1e-6, atol=1e-9)


@settings(max_examples=60, deadline=None)
@given(_mats(), st.integers(1, 15), st.booleans())
def test_local_topk_matches_full_sort(xy, k, largest):
    X, Q = xy
    dist = pairwise_distances(X, Q, MetricType.L2)
    ids = np.arange(len(X)) * 7 + 3          # non-trivial id mapping
    qidx, nid, dd = local_topk(dist, ids, k, largest)
    kk = min(k, len(X))
    assert len(qidx) == kk * len(Q)
    for qi in range(len(Q)):
        mine = sorted(dd[qidx == qi], reverse=largest)
        key = -dist[:, qi] if largest else dist[:, qi]
        truth = dist[np.argsort(key, kind="stable")[:kk], qi].tolist()
        np.testing.assert_allclose(mine, truth, rtol=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    arrays(np.float64, (30, 4), elements=_f),
    st.integers(1, 8),
    st.integers(0, 2**16),
)
def test_numpy_kmeans_deterministic_and_shaped(X, k, seed):
    C1 = numpy_kmeans(X, k, iters=5, seed=seed)
    C2 = numpy_kmeans(X, k, iters=5, seed=seed)
    np.testing.assert_array_equal(C1, C2)          # same seed → same model
    assert C1.shape[1] == X.shape[1]
    assert 1 <= C1.shape[0] <= min(k, len(X))
    assert np.isfinite(C1).all()


@settings(max_examples=30, deadline=None)
@given(_mats(max_n=20, max_q=1, max_d=6), st.integers(2, 6))
def test_kmeans_assign_is_nearest(xy, k):
    X, _ = xy
    C = numpy_kmeans(X, k, iters=5, seed=0)
    d = pairwise_distances(X, C, MetricType.L2)
    assign = d.argmin(axis=1)
    # every point's assigned centroid is at least as close as any other
    for i in range(len(X)):
        assert d[i, assign[i]] <= d[i].min() + 1e-9


def test_local_topk_k_zero_and_empty():
    dist = np.random.default_rng(0).random((10, 3))
    ids = np.arange(10)
    qidx, nid, dd = local_topk(dist, ids, 0, False)
    assert len(qidx) == len(nid) == len(dd) == 0
    qidx, nid, dd = local_topk(np.empty((10, 0)), ids, 5, False)
    assert len(qidx) == 0
