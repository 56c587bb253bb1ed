"""GetVectorByIds across the index families (index_node.h:340-350) and
the HasRawData gate (flat.cc:257-285): raw-holding indexes serve exact
vectors; quantized indexes without refine refuse."""

from __future__ import annotations

import numpy as np
import pytest

from knowhere_spark.config import HnswConfig, HnswSqConfig, IvfSq8Config
from knowhere_spark.operators.hnsw import HNSWIndex
from knowhere_spark.operators.hnsw_quant import QuantizedHNSWIndex
from knowhere_spark.operators.hnsw_sharded import ShardedHNSWIndex
from knowhere_spark.operators.sq import IVFSq8Index

from conftest import dense_df, gen_dense


def _fetch(idx, spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    return {r["id"]: list(r["vec"]) for r in idx.get_vector_by_ids(df).collect()}


def test_hnsw_get_vector_by_ids(spark):
    base = gen_dense(300, 16, seed=81)
    idx = HNSWIndex.build(
        dense_df(spark, base), HnswConfig(metric_type="L2", M=8, ef=16)
    )
    got = _fetch(idx, spark, [0, 7, 299])
    assert set(got) == {0, 7, 299}
    for i, v in got.items():
        assert np.allclose(v, base[i], atol=1e-6)


def test_sharded_hnsw_get_vector_by_ids(spark):
    base = gen_dense(400, 16, seed=82)
    idx = ShardedHNSWIndex.build(
        dense_df(spark, base), HnswConfig(metric_type="L2", M=8, ef=16), n_shards=2
    )
    got = _fetch(idx, spark, [1, 100, 399])
    assert set(got) == {1, 100, 399}
    for i, v in got.items():
        assert np.allclose(v, base[i], atol=1e-6)


def test_quantized_hnsw_raw_data_gate(spark):
    base = gen_dense(300, 16, seed=83)
    no_refine = QuantizedHNSWIndex.build(
        dense_df(spark, base),
        HnswSqConfig(metric_type="L2", M=8, ef=16, sq_type="SQ8"),
    )
    assert not no_refine.has_raw_data()
    with pytest.raises(ValueError, match="GetVectorByIds"):
        no_refine.get_vector_by_ids(spark.createDataFrame([(0,)], "id long"))

    refined = QuantizedHNSWIndex.build(
        dense_df(spark, base),
        HnswSqConfig(metric_type="L2", M=8, ef=16, sq_type="SQ8",
                     refine=True, refine_k=2.0),
    )
    assert refined.has_raw_data()
    got = _fetch(refined, spark, [5])
    assert np.allclose(got[5], base[5], atol=1e-6)


def test_sq8_raw_data_gate(spark):
    base = gen_dense(400, 16, seed=84)
    bare = IVFSq8Index.build(
        dense_df(spark, base), IvfSq8Config(metric_type="L2", nlist=8, nprobe=8)
    )
    assert not bare.has_raw_data()
    with pytest.raises(ValueError, match="GetVectorByIds"):
        bare.get_vector_by_ids(spark.createDataFrame([(0,)], "id long"))


# --- RangeSearch parity across the families added this round --------------

def test_bin_ivf_range_search(spark):
    from knowhere_spark.config import IvfConfig
    from knowhere_spark.operators.bin_ivf import BinaryIVFIndex
    from conftest import BIN_QUERY_SCHEMA, binary_df, gen_binary

    base = gen_binary(800, 64, seed=85)
    qs = gen_binary(5, 64, seed=86)
    idx = BinaryIVFIndex.build(
        binary_df(spark, base), IvfConfig(metric_type="HAMMING", nlist=8, nprobe=8)
    )
    cfg = IvfConfig(metric_type="HAMMING", nlist=8, nprobe=8,
                    radius=20.0, range_filter=0.0)
    rows = idx.range_search(binary_df(spark, qs, BIN_QUERY_SCHEMA), cfg).collect()
    assert len(rows) > 0
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
    for r in rows:
        exact = int(lut[np.bitwise_xor(base[r["neighbor_id"]], qs[r["query_id"]])].sum())
        assert r["distance"] == exact
        assert 0.0 <= r["distance"] < 20.0


def test_scann_range_search_exact_rescore(spark):
    from knowhere_spark.config import ScannConfig
    from knowhere_spark.operators.refine import ScannIndex

    base = gen_dense(600, 16, seed=87)
    qs = gen_dense(5, 16, seed=88)
    idx = ScannIndex.build(
        dense_df(spark, base),
        ScannConfig(metric_type="L2", nlist=8, nprobe=8, reorder_k=30),
    )
    d = ((base[:, None, :] - qs[None, :, :]) ** 2).sum(axis=2)
    radius = float(np.quantile(d, 0.05))
    cfg = ScannConfig(metric_type="L2", nlist=8, nprobe=8, reorder_k=30,
                      radius=radius, range_filter=0.0)
    from conftest import QUERY_SCHEMA as QS
    rows = idx.range_search(dense_df(spark, qs, QS), cfg).collect()
    assert len(rows) > 0
    for r in rows:
        exact = float(d[r["neighbor_id"], r["query_id"]])
        # distances are exact (raw re-score), not quantized
        assert abs(r["distance"] - exact) <= 1e-6 * max(1.0, exact)
        assert 0.0 <= r["distance"] < radius


def test_quantized_hnsw_range_search(spark):
    from knowhere_spark.operators.hnsw_quant import QuantizedHNSWIndex

    base = gen_dense(600, 16, seed=89)
    qs = gen_dense(5, 16, seed=90)
    idx = QuantizedHNSWIndex.build(
        dense_df(spark, base),
        HnswSqConfig(metric_type="L2", M=12, ef=24, sq_type="SQ8",
                     refine=True, refine_k=2.0),
    )
    d = ((base[:, None, :] - qs[None, :, :]) ** 2).sum(axis=2)
    radius = float(np.quantile(d, 0.03))
    from knowhere_spark.config import BaseConfig
    cfg = BaseConfig(metric_type="L2", radius=radius, range_filter=0.0)
    from conftest import QUERY_SCHEMA as QS
    rows = idx.range_search(dense_df(spark, qs, QS), cfg, ef=96).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["distance"] < radius


def test_sharded_hnsw_range_search(spark):
    base = gen_dense(700, 16, seed=77)
    qs = gen_dense(5, 16, seed=78)
    idx = ShardedHNSWIndex.build(
        dense_df(spark, base), HnswConfig(metric_type="L2", M=12, ef=24), n_shards=2
    )
    d = ((base[:, None, :] - qs[None, :, :]) ** 2).sum(axis=2)
    radius = float(np.quantile(d, 0.03))
    from knowhere_spark.config import BaseConfig
    cfg = BaseConfig(metric_type="L2", radius=radius, range_filter=0.0)
    from conftest import QUERY_SCHEMA as QS
    rows = idx.range_search(dense_df(spark, qs, QS), cfg, ef=96).collect()
    assert len(rows) > 0
    for r in rows:
        exact = float(d[r["neighbor_id"], r["query_id"]])
        assert abs(r["distance"] - exact) <= 1e-4 * max(1.0, exact)
        assert 0.0 <= r["distance"] < radius
