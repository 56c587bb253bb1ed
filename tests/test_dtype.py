"""fp16/bf16/int8 storage fidelity (operands.h:53-147, 180-198).

The reduced-precision axis stores vectors in the target dtype's
representable values and computes in fp32 (exact widening) — byte-exact
encode/decode round-trips, quantize-at-build + quantize-at-query search
semantics, raw-vector fetch, and persistence are all asserted here.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.config import ConfigError, VecType
from knowhere_spark.functions.dtype import (
    decode_bytes,
    encode_bytes,
    quantize_matrix,
    quantize_vec_col,
)

from conftest import QUERY_SCHEMA, dense_df, gen_dense


# --- numpy-level kernels ----------------------------------------------------

def test_fp16_quantize_matches_ieee_half():
    M = np.array([[1.0, 1.0009765625, 1.0004, 65504.0, 70000.0, -0.0]],
                 dtype=np.float32)
    Q = quantize_matrix(M, "FP16")
    # 1.0009765625 = 1 + 2^-10 is the next half after 1.0 — exact;
    # 1.0004 rounds back down to 1.0; 70000 overflows to inf
    assert Q[0, 0] == 1.0
    assert Q[0, 1] == np.float32(np.float16(1.0009765625))
    assert Q[0, 2] == 1.0
    assert Q[0, 3] == 65504.0
    assert np.isinf(Q[0, 4])
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(
            Q, M.astype(np.float16).astype(np.float32)
        )


def test_bf16_round_to_nearest_even():
    # bf16 keeps an 8-bit mantissa: ulp at 1.0 is 2^-7 = 0.0078125
    M = np.array(
        [[1.0, 1.0078125, 1.00390625, 1.01171875, 3.0e38, float("nan")]],
        dtype=np.float32,
    )
    Q = quantize_matrix(M, "BF16")
    assert Q[0, 0] == 1.0
    assert Q[0, 1] == np.float32(1.0078125)     # exactly representable
    # 1.00390625 is EXACTLY halfway between 1.0 and 1.0078125 -> round to
    # even mantissa -> 1.0
    assert Q[0, 2] == 1.0
    # 1.01171875 halfway between 1.0078125 and 1.015625 -> even -> 1.015625
    assert Q[0, 3] == np.float32(1.015625)
    assert np.isfinite(Q[0, 4]) or np.isinf(Q[0, 4])  # large values round up
    assert np.isnan(Q[0, 5])                           # NaN stays NaN


def test_int8_quantize_rounds_and_clips():
    M = np.array([[0.4, 0.5, 1.6, -200.0, 200.0, 127.4]], dtype=np.float32)
    Q = quantize_matrix(M, "INT8")
    np.testing.assert_array_equal(Q, [[0.0, 0.0, 2.0, -128.0, 127.0, 127.0]])
    # (0.5 -> 0 and 1.6 -> 2: numpy rint = round-half-to-even)


@pytest.mark.parametrize("vt", ["FP16", "BF16", "INT8"])
def test_encode_decode_byte_exact_roundtrip(vt):
    rng = np.random.default_rng(5)
    M = (rng.standard_normal((40, 16)) * 30).astype(np.float32)
    Q = quantize_matrix(M, vt)
    b1 = encode_bytes(Q, vt)
    width = 1 if vt == "INT8" else 2
    assert all(len(b) == 16 * width for b in b1)
    D = decode_bytes(b1, vt)
    # decode is EXACT widening: the fp32 values round-trip bit-for-bit
    np.testing.assert_array_equal(D, Q)
    # ...and re-encoding reproduces identical bytes (storage fidelity)
    assert encode_bytes(D, vt) == b1


def test_quantize_idempotent():
    rng = np.random.default_rng(6)
    M = rng.standard_normal((20, 8)).astype(np.float32)
    for vt in ("FP16", "BF16", "INT8"):
        Q = quantize_matrix(M, vt)
        np.testing.assert_array_equal(quantize_matrix(Q, vt), Q)


# --- Spark-level semantics --------------------------------------------------

def test_fp16_flat_search_matches_quantized_brute_force(spark):
    from knowhere_spark.factory import create_index

    nb, dim, nq, k = 300, 16, 5, 10
    base = gen_dense(nb, dim, seed=31)
    qs = gen_dense(nq, dim, seed=32)
    idx = create_index("FLAT", {"metric_type": "L2", "k": k}, dtype="FP16").build(
        dense_df(spark, base)
    )
    got = idx.search(dense_df(spark, qs, QUERY_SCHEMA), k=k).collect()

    # ground truth: L2 over fp16-quantized base AND queries, fp32 compute
    Bq = quantize_matrix(np.asarray(base, dtype=np.float32), "FP16").astype(np.float64)
    Qq = quantize_matrix(np.asarray(qs, dtype=np.float32), "FP16").astype(np.float64)
    d = ((Bq[None, :, :] - Qq[:, None, :]) ** 2).sum(axis=2)   # (nq, nb)
    want = {}
    for qi in range(nq):
        order = np.lexsort((np.arange(nb), d[qi]))[:k]
        want[qi] = {(int(n), round(float(d[qi, n]), 5)) for n in order}
    got_sets: dict[int, set] = {}
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(
            (r["neighbor_id"], round(r["distance"], 5))
        )
    assert got_sets == want


def test_fp16_changes_results_vs_fp32_on_crafted_ties(spark):
    """Storage precision is observable: two base rows that differ only
    below fp16 resolution tie after quantization (and the id tie-break
    decides), while fp32 keeps them distinct."""
    from knowhere_spark.factory import create_index

    eps = 1e-4                       # below fp16 ulp at 1.0 (9.77e-4)
    base = np.zeros((2, 4), dtype=np.float64)
    base[0, 0] = 1.0 + eps           # farther in fp32, tied in fp16
    base[1, 0] = 1.0
    q = np.zeros((1, 4), dtype=np.float64)
    bdf = dense_df(spark, base)
    qdf = dense_df(spark, q, QUERY_SCHEMA)

    fp32 = create_index("FLAT", {"metric_type": "L2", "k": 1}).build(bdf)
    r32 = fp32.search(qdf, k=1).collect()[0]
    assert r32["neighbor_id"] == 1   # 1.0 is closer than 1.0001 in fp32

    fp16 = create_index("FLAT", {"metric_type": "L2", "k": 1}, dtype="FP16").build(bdf)
    r16 = fp16.search(qdf, k=1).collect()[0]
    assert r16["neighbor_id"] == 0   # quantized tie -> smallest id wins


def test_fp16_get_vector_by_ids_returns_quantized(spark):
    from knowhere_spark.factory import create_index

    base = gen_dense(20, 8, seed=33)
    idx = create_index("FLAT", {"metric_type": "L2", "k": 3}, dtype="FP16").build(
        dense_df(spark, base)
    )
    rows = idx.get_vector_by_ids(
        spark.createDataFrame([(3,)], "id long")
    ).collect()
    got = np.array(rows[0]["vec"], dtype=np.float32)
    want = quantize_matrix(np.asarray(base[3:4], dtype=np.float32), "FP16")[0]
    np.testing.assert_array_equal(got, want)


def test_fp16_ivf_save_load_preserves_dtype(spark, tmp_path):
    from knowhere_spark.factory import TypedIndex, create_index, load_index

    base = gen_dense(200, 8, seed=34)
    qs = gen_dense(3, 8, seed=35)
    idx = create_index(
        "IVF_FLAT", {"metric_type": "L2", "nlist": 4, "nprobe": 4, "k": 5},
        dtype="BF16",
    ).build(dense_df(spark, base))
    p = str(tmp_path / "bf16_ivf")
    idx.save(p)
    back = load_index(spark, p)
    assert isinstance(back, TypedIndex)
    assert back.vec_type == VecType.BF16
    qdf = dense_df(spark, qs, QUERY_SCHEMA)
    a = sorted((r["query_id"], r["neighbor_id"]) for r in idx.search(qdf, k=5).collect())
    b = sorted((r["query_id"], r["neighbor_id"]) for r in back.search(qdf, k=5).collect())
    assert a == b and len(a) == 15


def test_int8_rejected_where_reference_rejects(spark):
    from knowhere_spark.factory import create_index

    with pytest.raises(ConfigError):
        create_index("DISKANN", {"metric_type": "L2"}, dtype="INT8")


def test_estimate_size_uses_dtype_width():
    from knowhere_spark.factory import estimate_index_size

    full = estimate_index_size("FLAT", 1000, 64)
    half = estimate_index_size("FLAT", 1000, 64, {"vec_type": "FP16"})
    assert full == 1000 * (64 * 4 + 8)
    assert half == 1000 * (64 * 2 + 8)


def test_quantize_vec_col_spark_matches_numpy(spark):
    base = gen_dense(50, 8, seed=36)
    df = dense_df(spark, base)
    out = quantize_vec_col(df, "BF16").orderBy("id").collect()
    got = np.array([r["vec"] for r in out], dtype=np.float32)
    want = quantize_matrix(np.asarray(base, dtype=np.float32), "BF16")
    np.testing.assert_array_equal(got, want)


# --- oracle mirror parity (repr-level, sign-of-zero regression) --------------

def test_oracle_mirror_matches_codec_at_repr_level():
    """The DuckDB `_dtype_rt_sql` mirror must match encode/decode_bytes
    byte-for-byte at the repr level, not just numerically: `-0.0 == 0.0`
    is True but the driver's hash distinguishes them (r12 regression —
    the int8 wire format cannot carry a signed zero, so every x in
    (-0.5, 0) decodes to +0.0 while the naive mirror preserved -0.0)."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as entry_mod

    vals = np.array(
        [
            -0.0, 0.0, -0.4999, -0.5, -0.25, 0.4999, 0.5,
            -1e-9, 1e-9,                  # fp16/bf16 flush-to-zero band
            -2.0 ** -25, 2.0 ** -25,      # fp16 subnormal boundary
            -2.0 ** -26, -6e-8,           # below the fp16 subnormal quantum
            -127.5, 127.5, -128.4, 128.4, -200.0, 200.0,
            0.28125, -0.28125,            # decimal round-half ties
            1.0009765625, -1.0009765625,  # fp16 mantissa ties
            65504.0, 65520.0, -65520.0,   # fp16 saturation edge
        ],
        dtype=np.float32,
    )
    M = vals.reshape(1, -1)
    con = duckdb.connect()
    for kind, vt in (("fp16", "FP16"), ("bf16", "BF16"), ("int8", "INT8")):
        codec = decode_bytes(encode_bytes(M, vt), vt).astype(np.float64)[0]
        sql = entry_mod._dtype_rt_sql("x", kind)
        got = [
            con.execute(f"SELECT {sql} FROM (SELECT CAST(? AS DOUBLE) x)",
                        [float(v)]).fetchone()[0]
            for v in vals.astype(np.float64)
        ]
        for v, g, c in zip(vals, got, codec):
            if np.isnan(c):
                assert np.isnan(g), (kind, v)
                continue
            # repr comparison: catches sign-of-zero where == cannot
            assert repr(float(g)) == repr(float(c)), (kind, float(v), g, c)
