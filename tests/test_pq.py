"""IVF_PQ ADC search — recall vs exact numpy oracle (test_search.cc
pattern, ANN floor 0.6) + config validation (dim % m, ivf_config.h:68-98)."""

from __future__ import annotations

import numpy as np
import pytest

from knowhere_spark.config import ConfigError, IvfPqConfig, load_config
from knowhere_spark.factory import build_index
from knowhere_spark.operators.pq import IVFPqIndex

from conftest import QUERY_SCHEMA, dense_df, gen_dense, np_knn, recall_at_k


def _run(spark, metric, nb=1000, dim=64, nq=10, k=10, m=16, nprobe=8, nlist=8):
    base = gen_dense(nb, dim, seed=11)
    qs = gen_dense(nq, dim, seed=12)
    idx = IVFPqIndex.build(
        dense_df(spark, base),
        IvfPqConfig(metric_type=metric, nlist=nlist, nprobe=nprobe, m=m, k=k),
    )
    res = idx.search(dense_df(spark, qs, QUERY_SCHEMA), k=k)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))
    truth = np_knn(base, qs, k, metric)
    return recall_at_k(got, truth, k), idx


@pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
def test_pq_recall(spark, metric):
    recall, idx = _run(spark, metric)
    assert recall >= 0.6          # ANN UT floor (test_search.cc:28)
    assert not idx.has_raw_data()  # PQ drops raw vectors
    assert idx.dim() == 64


@pytest.mark.parametrize("metric", ["L2", "COSINE"])
def test_pq_refine_exact_when_full(spark, metric):
    """nprobe=nlist + refine_k >= nb: every row is ADC-scanned and every
    candidate exactly re-ranked, so the result is structurally exact —
    the SCANN reorder_k discipline applied to IVF_PQ
    (ivf_config.h:101-115)."""
    nb, k = 600, 10
    base = gen_dense(nb, 64, seed=21)
    qs = gen_dense(8, 64, seed=22)
    idx = IVFPqIndex.build(
        dense_df(spark, base),
        IvfPqConfig(
            metric_type=metric, nlist=8, nprobe=8, m=16, k=k,
            refine_k=nb, with_raw_data=True,
        ),
    )
    assert idx.has_raw_data()
    got = {}
    for r in idx.search(dense_df(spark, qs, QUERY_SCHEMA), k=k).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))
    truth = np_knn(base, qs, k, metric)
    assert recall_at_k(got, truth, k) == 1.0


def test_pq_refine_lifts_recall(spark):
    """At fixed nprobe, a moderate refine_k must not lower recall vs the
    pure-ADC result (the reorder_k premise) — and the distributed strategy
    agrees with the driver path."""
    nb, k = 1000, 10
    base = gen_dense(nb, 64, seed=31)
    qs = gen_dense(10, 64, seed=32)
    truth = np_knn(base, qs, k, "L2")

    def run(refine_k, strategy="auto"):
        cfg = IvfPqConfig(
            metric_type="L2", nlist=8, nprobe=4, m=16, k=k,
            refine_k=refine_k, with_raw_data=True,
        )
        idx = IVFPqIndex.build(dense_df(spark, base), cfg)
        got = {}
        res = idx.search(dense_df(spark, qs, QUERY_SCHEMA), k=k, strategy=strategy)
        for r in res.collect():
            got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))
        return recall_at_k(got, truth, k), got

    r_adc, _ = run(0)
    r_ref, got_driver = run(5 * k)
    assert r_ref >= r_adc
    _, got_dist = run(5 * k, strategy="distributed")
    assert {q: [n for n, _ in v] for q, v in got_driver.items()} == {
        q: [n for n, _ in v] for q, v in got_dist.items()
    }


def test_pq_refine_requires_raw(spark):
    with pytest.raises(ConfigError):
        IvfPqConfig(metric_type="L2", nlist=4, m=8, refine_k=20)
    base = gen_dense(200, 32, seed=41)
    idx = IVFPqIndex.build(
        dense_df(spark, base), IvfPqConfig(metric_type="L2", nlist=4, m=8)
    )
    with pytest.raises(ValueError):
        idx.search(
            dense_df(spark, gen_dense(2, 32, seed=42), QUERY_SCHEMA),
            k=5, refine_k=20,
        )


def test_pq_dim_validation(spark):
    base = gen_dense(100, 30, seed=1)   # 30 % 16 != 0
    with pytest.raises(ConfigError):
        IVFPqIndex.build(
            dense_df(spark, base), IvfPqConfig(metric_type="L2", nlist=4, m=16)
        )


def test_pq_via_factory(spark):
    base = gen_dense(300, 32, seed=5)
    qdf = dense_df(spark, gen_dense(3, 32, seed=6), QUERY_SCHEMA).withColumnRenamed(
        "vec", "vec"
    )
    built = build_index(
        dense_df(spark, base),
        "IVF_PQ",
        {"metric_type": "L2", "nlist": 4, "nprobe": 4, "m": 8},
    )
    out = built.search(qdf, k=5)
    assert out.count() == 15
    assert set(out.columns) == {"query_id", "neighbor_id", "distance", "rank"}


def test_pq_wide_codebook_codes_do_not_overflow(spark):
    """nbits=16 is allowed by IvfPqConfig (ksub up to 65536); codeword
    ids past 32767 must not wrap through int16/SMALLINT storage (the SQ
    code_size width rule applied to PQ).  The width switch keys on the
    ACTUAL codebook size — a tiny train sample caps ksub' and smallint
    stays correct — so exercise _encode_df with a genuinely wide
    codebook directly."""
    from knowhere_spark.operators.pq import _encode_df

    rng = np.random.default_rng(51)
    ksub, subdim = 40_000, 4
    codebooks = rng.standard_normal((1, ksub, subdim))
    # rows sitting exactly on high-index codewords — a wrap would flip
    # the id negative and encode a different codeword
    picks = [39_999, 33_000, 5]
    rows = [(i, 0, [float(x) for x in codebooks[0, p]]) for i, p in enumerate(picks)]
    assigned = spark.createDataFrame(rows, "id long, cell_id int, vec array<float>")
    out = _encode_df(assigned, codebooks)
    assert dict(out.dtypes)["codes"] == "array<int>"
    got = {r["id"]: r["codes"][0] for r in out.collect()}
    assert got == {i: p for i, p in enumerate(picks)}

    # narrow codebooks keep the compact SMALLINT storage
    small = _encode_df(assigned, codebooks[:, :256, :])
    assert dict(small.dtypes)["codes"] == "array<smallint>"
