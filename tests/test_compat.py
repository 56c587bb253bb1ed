"""Reference-bindings facade (knowhere_spark/compat.py vs the surface of
python/knowhere/__init__.py + knowhere.i IndexWrap): the reference user's
call sequences, verified against numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from knowhere_spark import compat as knowhere


@pytest.fixture(autouse=True)
def _pin_session(spark):
    knowhere.set_session(spark)


def _np_knn(base, queries, k):
    d = ((base[None, :, :] - queries[:, None, :]) ** 2).sum(axis=2)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return ids, np.take_along_axis(d, ids, axis=1)


def test_flat_build_search_matches_numpy():
    rng = np.random.default_rng(51)
    base = rng.standard_normal((200, 16)).astype(np.float32)
    queries = base[:5] + 1e-3

    idx = knowhere.CreateIndex("FLAT", knowhere.GetCurrentVersion())
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    assert idx.Count() == 200 and idx.Dim() == 16 and idx.HasRawData("L2")

    dis, ids = idx.Search(
        knowhere.ArrayToDataSet(queries), '{"metric_type": "L2", "k": 5}'
    )
    assert dis.shape == ids.shape == (5, 5)
    assert dis.dtype == np.float32 and ids.dtype == np.int32
    want_ids, want_d = _np_knn(base.astype(np.float64), queries.astype(np.float64), 5)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(dis, want_d, rtol=1e-4)


def test_bitset_filters_rows_out():
    rng = np.random.default_rng(52)
    base = rng.standard_normal((50, 8)).astype(np.float32)
    q = base[:3]
    idx = knowhere.CreateIndex("FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    bs = knowhere.CreateBitSet(50)
    for i in range(3):
        bs.set(i)          # bit set = filtered OUT (bitsetview.h)
    dis, ids = idx.Search(
        knowhere.ArrayToDataSet(q), '{"metric_type": "L2", "k": 4}', bs
    )
    assert not (set(ids.ravel().tolist()) & {0, 1, 2})


def test_ivf_search_with_nprobe_and_padding():
    rng = np.random.default_rng(53)
    base = rng.standard_normal((120, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("IVF_FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base),
              '{"metric_type": "L2", "nlist": 4}')
    # nprobe=nlist probes everything -> exact; k > rows exercises padding
    dis, ids = idx.Search(
        knowhere.ArrayToDataSet(base[:2]),
        '{"metric_type": "L2", "k": 130, "nprobe": 4}',
    )
    assert ids.shape == (2, 130)
    assert (ids[:, :120] >= 0).all()
    assert (ids[:, 120:] == -1).all()          # reference -1 padding
    assert np.isinf(dis[:, 120:]).all()


def test_range_search_lists():
    rng = np.random.default_rng(54)
    base = rng.standard_normal((100, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    dis_list, ids_list = idx.RangeSearch(
        knowhere.ArrayToDataSet(base[:4]),
        '{"metric_type": "L2", "radius": 4.0, "range_filter": 0.0}',
    )
    assert len(dis_list) == len(ids_list) == 4
    for qi in range(4):
        assert qi in ids_list[qi].tolist()     # each query finds itself (d=0)
        assert (dis_list[qi] < 4.0).all()
        d = ((base - base[qi]) ** 2).sum(axis=1)
        assert len(ids_list[qi]) == int((d < 4.0).sum())


def test_get_vector_by_ids_and_serialize(tmp_path):
    rng = np.random.default_rng(55)
    base = rng.standard_normal((60, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("IVF_FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base),
              '{"metric_type": "L2", "nlist": 4}')
    got = idx.GetVectorByIds(knowhere.ArrayToDataSet(np.array([3, 7, 11])))
    np.testing.assert_allclose(got, base[[3, 7, 11]], rtol=1e-6)

    p = str(tmp_path / "compat_ivf")
    idx.Serialize(p)
    idx2 = knowhere.CreateIndex("IVF_FLAT", 1)
    idx2.Deserialize(p)
    assert idx2.Count() == 60
    d1, i1 = idx.Search(knowhere.ArrayToDataSet(base[:3]),
                        '{"metric_type": "L2", "k": 5, "nprobe": 4}')
    d2, i2 = idx2.Search(knowhere.ArrayToDataSet(base[:3]),
                         '{"metric_type": "L2", "k": 5, "nprobe": 4}')
    np.testing.assert_array_equal(i1, i2)


def test_binary_index_uint8():
    rng = np.random.default_rng(56)
    base = rng.integers(0, 256, size=(80, 8), dtype=np.uint8)
    idx = knowhere.CreateIndex("BIN_FLAT", 1, type=np.uint8)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "HAMMING"}')
    assert idx.Dim() == 64                       # bits (knowhere.i:401)
    dis, ids = idx.Search(
        knowhere.ArrayToDataSet(base[:3]), '{"metric_type": "HAMMING", "k": 1}'
    )
    np.testing.assert_array_equal(ids[:, 0], [0, 1, 2])   # self at distance 0
    np.testing.assert_array_equal(dis[:, 0], [0.0, 0.0, 0.0])


def test_sparse_csr_bm25():
    # CSR: 4 docs over a 6-term vocabulary
    indptr = np.array([0, 3, 5, 8, 10])
    indices = np.array([0, 1, 2, 1, 3, 0, 4, 5, 2, 5])
    data = np.array([2.0, 1.0, 1.0, 3.0, 1.0, 1.0, 2.0, 1.0, 2.0, 2.0],
                    dtype=np.float32)
    ds = knowhere.ArrayToSparseDataSet(data, indices, indptr)
    idx = knowhere.CreateIndex("SPARSE_INVERTED_INDEX", 1)
    idx.Build(ds, '{"metric_type": "IP", "inverted_index_algo": "TAAT_NAIVE"}')
    assert idx.Count() == 4
    # query = term 1 -> docs 0 (tf 1) and 1 (tf 3) score by IP
    q = knowhere.ArrayToSparseDataSet(
        np.array([1.0], dtype=np.float32), np.array([1]), np.array([0, 1])
    )
    dis, ids = idx.Search(q, '{"metric_type": "IP", "k": 2}')
    assert ids[0, 0] == 1 and ids[0, 1] == 0     # doc 1 scores higher
    np.testing.assert_allclose(dis[0], [3.0, 1.0])


def test_fp16_dtype_axis():
    rng = np.random.default_rng(57)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1, type=np.float16)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    got = idx.GetVectorByIds(knowhere.ArrayToDataSet(np.array([0])))
    # raw vectors come back fp16-quantized — the storage contract
    np.testing.assert_array_equal(
        got[0], base[0].astype(np.float16).astype(np.float32)
    )


def test_bruteforce_statics():
    rng = np.random.default_rng(58)
    base = rng.standard_normal((90, 8)).astype(np.float32)
    q = base[:3]
    dis, ids = knowhere.BruteForceSearch(
        np.float32,
        knowhere.ArrayToDataSet(base),
        knowhere.ArrayToDataSet(q),
        '{"metric_type": "L2", "k": 3}',
    )
    np.testing.assert_array_equal(ids[:, 0], [0, 1, 2])
    dl, il = knowhere.BruteForceRangeSearch(
        np.float32,
        knowhere.ArrayToDataSet(base),
        knowhere.ArrayToDataSet(q),
        '{"metric_type": "L2", "radius": 2.0, "range_filter": 0.0}',
    )
    assert len(dl) == 3 and all((d < 2.0).all() for d in dl)


def test_facade_completeness_vs_reference_surface():
    """Every public name the reference's __init__.py exports must exist on
    the facade (identity/no-op where the SWIG machinery is not needed)."""
    ref_surface = [
        "CreateIndex", "BruteForceSearch", "BruteForceRangeSearch",
        "GetCurrentVersion", "CreateBitSet", "Load", "Dump",
        "ArrayToDataSet", "ArrayToSparseDataSet", "DataSetToArray",
        "RangeSearchDataSetToArray", "GetVectorDataSetToArray",
        "GetNullDataSet", "GetNullBitSetView",
        "SetSimdType", "SetBuildThreadPool", "SetSearchThreadPool",
    ]
    for name in ref_surface:
        assert hasattr(knowhere, name), name


def test_load_dump_aliases(tmp_path):
    rng = np.random.default_rng(59)
    base = rng.standard_normal((30, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("IVF_FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2", "nlist": 2}')
    p = str(tmp_path / "dumped")
    knowhere.Dump(idx, p)
    idx2 = knowhere.Load(knowhere.CreateIndex("IVF_FLAT", 1), p)
    assert idx2.Count() == 30


def test_range_search_radius_only_default():
    """Omitting range_filter (the common reference call) must mean 'no
    inner bound', not an inf<=d<radius empty range."""
    rng = np.random.default_rng(60)
    base = rng.standard_normal((80, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    dis_list, ids_list = idx.RangeSearch(
        knowhere.ArrayToDataSet(base[:3]), '{"metric_type": "L2", "radius": 4.0}'
    )
    for qi in range(3):
        d = ((base - base[qi]) ** 2).sum(axis=1)
        assert len(ids_list[qi]) == int((d < 4.0).sum()) > 0


def test_fp16_range_search_honors_radius():
    """The TypedIndex wrapper must not shadow the per-call radius (the
    swap-restore has to hit the INNER index's config)."""
    rng = np.random.default_rng(61)
    base = rng.standard_normal((60, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("IVF_FLAT", 1, type=np.float16)
    idx.Build(knowhere.ArrayToDataSet(base),
              '{"metric_type": "L2", "nlist": 2, "nprobe": 2}')
    dis_list, ids_list = idx.RangeSearch(
        knowhere.ArrayToDataSet(base[:2]), '{"metric_type": "L2", "radius": 6.0}'
    )
    assert all(len(ids) > 0 for ids in ids_list)
    assert all((d < 6.0).all() for d in dis_list)


def test_sparse_search_with_bitset():
    indptr = np.array([0, 1, 2, 3])
    indices = np.array([1, 1, 1])
    data = np.array([3.0, 2.0, 1.0], dtype=np.float32)
    idx = knowhere.CreateIndex("SPARSE_INVERTED_INDEX", 1)
    idx.Build(knowhere.ArrayToSparseDataSet(data, indices, indptr),
              '{"metric_type": "IP", "inverted_index_algo": "TAAT_NAIVE"}')
    bs = knowhere.CreateBitSet(3)
    bs.set(0)                                  # filter out the top doc
    q = knowhere.ArrayToSparseDataSet(
        np.array([1.0], dtype=np.float32), np.array([1]), np.array([0, 1])
    )
    dis, ids = idx.Search(q, '{"metric_type": "IP", "k": 2}', bs)
    assert 0 not in ids[0].tolist()
    assert ids[0, 0] == 1                      # next-best doc


def test_binary_get_vector_by_ids_returns_uint8():
    rng = np.random.default_rng(62)
    base = rng.integers(0, 256, size=(20, 8), dtype=np.uint8)
    idx = knowhere.CreateIndex("BIN_FLAT", 1, type=np.uint8)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "HAMMING"}')
    got = idx.GetVectorByIds(knowhere.ArrayToDataSet(np.array([2, 5])))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, base[[2, 5]])


def test_flat_serialize_roundtrip(tmp_path):
    rng = np.random.default_rng(63)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    p = str(tmp_path / "flat_idx")
    idx.Serialize(p)
    idx2 = knowhere.CreateIndex("FLAT", 1)
    idx2.Deserialize(p)
    assert idx2.Count() == 40
    d1, i1 = idx.Search(knowhere.ArrayToDataSet(base[:3]),
                        '{"metric_type": "L2", "k": 4}')
    d2, i2 = idx2.Search(knowhere.ArrayToDataSet(base[:3]),
                         '{"metric_type": "L2", "k": 4}')
    np.testing.assert_array_equal(i1, i2)


def test_int8_dtype_axis_and_unknown_dtype_rejected():
    rng = np.random.default_rng(64)
    base = (rng.standard_normal((30, 8)) * 50).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1, type=np.int8)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')
    got = idx.GetVectorByIds(knowhere.ArrayToDataSet(np.array([0])))
    np.testing.assert_array_equal(
        got[0], np.clip(np.rint(base[0]), -128, 127).astype(np.float32)
    )
    with pytest.raises(ValueError):
        knowhere.CreateIndex("FLAT", 1, type=np.complex64)


def test_deserialize_restores_wrapper_state(tmp_path):
    """ADVICE r3: a deserialized IndexWrap must behave like the built one —
    Dim() real, metric restored (Search without metric_type in the query
    JSON must NOT fall back to L2 on an IP index), and a loaded BIN_*
    index must keep its binary identity for GetVectorByIds."""
    rng = np.random.default_rng(57)

    # IP-metric index: searched WITHOUT metric_type after Deserialize
    base = rng.standard_normal((80, 12)).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "IP"}')
    p = str(tmp_path / "compat_flat_ip")
    idx.Serialize(p)
    fresh = knowhere.CreateIndex("FLAT", 1)
    fresh.Deserialize(p)
    assert fresh.Dim() == 12
    want = idx.Search(knowhere.ArrayToDataSet(base[:4]), '{"metric_type": "IP", "k": 3}')
    got = fresh.Search(knowhere.ArrayToDataSet(base[:4]), '{"k": 3}')  # no metric
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5)

    # BIN index: loaded wrapper must take the uint8 branch
    bbase = rng.integers(0, 256, size=(40, 8), dtype=np.uint8)
    bidx = knowhere.CreateIndex("BIN_FLAT", 1, type=np.uint8)
    bidx.Build(knowhere.ArrayToDataSet(bbase), '{"metric_type": "HAMMING"}')
    bp = str(tmp_path / "compat_bin")
    bidx.Serialize(bp)
    bfresh = knowhere.CreateIndex("BIN_FLAT", 1, type=np.uint8)
    bfresh.Deserialize(bp)
    assert bfresh.Dim() == 64        # bits, not bytes
    got = bfresh.GetVectorByIds(knowhere.ArrayToDataSet(np.array([1, 5])))
    assert got.dtype == np.uint8 and got.shape == (2, 8)
    np.testing.assert_array_equal(got, bbase[[1, 5]])


def test_bitset_large_set_uses_bounded_plan():
    """A corpus-scale bitset (> _ISIN_LITERAL_MAX ids) must not compile a
    literal per id into the plan; results must equal the small-set path."""
    rng = np.random.default_rng(58)
    base = rng.standard_normal((300, 8)).astype(np.float32)
    idx = knowhere.CreateIndex("FLAT", 1)
    idx.Build(knowhere.ArrayToDataSet(base), '{"metric_type": "L2"}')

    bs = knowhere.CreateBitSet(300)
    for i in range(0, 300, 2):       # block every even id
        bs.set(i)
    # force the broadcast path regardless of the default threshold
    old = knowhere.BitSet._ISIN_LITERAL_MAX
    knowhere.BitSet._ISIN_LITERAL_MAX = 10
    try:
        expr = bs.filter_expr("id")
        assert "isin" not in str(expr).lower()   # not a literal-list plan
        dis, ids = idx.Search(
            knowhere.ArrayToDataSet(base[:5]), '{"metric_type": "L2", "k": 4}', bs
        )
    finally:
        knowhere.BitSet._ISIN_LITERAL_MAX = old
    dis2, ids2 = idx.Search(
        knowhere.ArrayToDataSet(base[:5]), '{"metric_type": "L2", "k": 4}', bs
    )
    assert (ids % 2 == 1).all()                  # only odd ids survive
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(dis, dis2, rtol=1e-6)


def test_binding_surface_complete_r5(spark):
    """The remaining reference-binding functions (__init__.py:56-185):
    ArrayToBinary, WriteIndexToDisk, the typed DataSetToArray family."""
    import numpy as np
    from knowhere_spark import compat as K

    K.set_session(spark)
    # ArrayToBinary: uint8 only, binary DataSet out
    arr = np.arange(32, dtype=np.uint8).reshape(4, 8)
    ds = K.ArrayToBinary(arr)
    assert ds.binary and ds.rows == 4
    try:
        K.ArrayToBinary(arr.astype(np.float32))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # typed converters
    f32 = np.array([[1.5, 2.75], [0.1, -3.0]], dtype=np.float32)
    f16 = K.GetFloat16VectorDataSetToArray(f32)
    assert f16.dtype == np.float16
    np.testing.assert_allclose(f16.astype(np.float32), f32, rtol=1e-3)
    bf = K.GetBFloat16VectorDataSetToArray(f32)
    assert bf.dtype == np.float32   # numpy has no bfloat16; values bf16-rounded
    assert abs(float(bf[0, 0]) - 1.5) < 1e-6   # 1.5 is exactly representable
    bb = K.GetBinaryVectorDataSetToArray(arr)
    assert bb.dtype == np.uint8 and bb.shape == (4, 8)


def test_write_index_to_disk_roundtrip(spark, tmp_path):
    import numpy as np
    from knowhere_spark import compat as K

    K.set_session(spark)
    rng = np.random.default_rng(9)
    base = K.ArrayToDataSet(rng.random((50, 8)).astype(np.float32))
    idx = K.CreateIndex("FLAT", K.GetCurrentVersion())
    idx.Build(base, '{"metric_type": "L2"}')
    path = str(tmp_path / "flat_disk")
    K.WriteIndexToDisk(idx, "FLAT", path)
    idx2 = K.CreateIndex("FLAT", K.GetCurrentVersion())
    idx2.Deserialize(path)
    assert idx2.Count() == 50
    # mismatched type is rejected, not silently written
    try:
        K.WriteIndexToDisk(idx, "HNSW", str(tmp_path / "bad"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
