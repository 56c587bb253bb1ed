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
