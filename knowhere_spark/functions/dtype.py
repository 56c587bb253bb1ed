"""Reduced-precision vector storage (fp16 / bf16 / int8).

The reference stores vectors in the dataset's element type and widens to
fp32 for compute (operands.h:53-147: ``fp16``/``bf16`` are 2-byte storage
types with exact fp32 widening; operands.h:180-198: compute promotes to
fp32).  The Spark mapping: a reduced-dtype index quantizes every stored
vector (and every incoming query) to values EXACTLY representable in the
target dtype, keeps them in fp32 columns (any fp16/bf16/int8 value
round-trips float32 parquet bit-exactly), and computes in fp32 — so
results are byte-faithful to a reference index holding the same bytes,
while every kernel stays unchanged.

``encode_bytes``/``decode_bytes`` give the compact 2-byte (1-byte for
int8) wire format for storage-footprint-sensitive sinks; round-tripping
is bit-exact (tested in tests/test_dtype.py).
"""

from __future__ import annotations

import numpy as np

from knowhere_spark.config import VecType

#: dtypes that imply a quantize-at-build / quantize-at-query contract
REDUCED_VEC_TYPES = frozenset({VecType.FP16, VecType.BF16, VecType.INT8})

#: storage bytes per element (operands.h:53-147)
ELEMENT_BYTES = {
    VecType.FP32: 4,
    VecType.FP16: 2,
    VecType.BF16: 2,
    VecType.INT8: 1,
}


def _bf16_round(M: np.ndarray) -> np.ndarray:
    """fp32 -> nearest bf16 (round-to-nearest-even on the upper 16 bits,
    the IEEE default the reference's bfloat16 conversion uses) -> exact
    fp32 widening."""
    bits = np.ascontiguousarray(M, dtype=np.float32).view(np.uint32)
    # round half to even: add 0x7FFF + lsb-of-result before truncating
    rounded = bits + (0x7FFF + ((bits >> 16) & 1))
    out = (rounded & np.uint32(0xFFFF0000)).view(np.float32).copy()
    # NaN must stay NaN: truncation of a NaN payload can land on Inf
    nan = np.isnan(M)
    if nan.any():
        out[nan] = np.float32("nan")
    return out


def quantize_matrix(M: np.ndarray, vec_type: VecType | str) -> np.ndarray:
    """fp32 values representable in ``vec_type`` (fp32 in, fp32 out).

    fp16: IEEE half round-trip.  bf16: round-to-nearest-even truncation.
    int8: round + clip to [-128, 127] (the reference's int8 axis stores
    integral data; arbitrary floats are snapped to the nearest storable
    value the same way).
    """
    vt = VecType(vec_type.upper()) if isinstance(vec_type, str) else vec_type
    M = np.asarray(M, dtype=np.float32)
    if vt == VecType.FP32:
        return M
    if vt == VecType.FP16:
        # out-of-range fp32 overflows to +-inf — fp16's saturating
        # semantics, intended (the reference's conversion does the same)
        with np.errstate(over="ignore"):
            return M.astype(np.float16).astype(np.float32)
    if vt == VecType.BF16:
        return _bf16_round(M)
    if vt == VecType.INT8:
        return np.clip(np.rint(M), -128, 127).astype(np.float32)
    raise ValueError(f"no quantization for vec_type {vt.value}")


def encode_bytes(M: np.ndarray, vec_type: VecType | str) -> list[bytes]:
    """Per-row compact storage bytes (2 B/elem fp16+bf16, 1 B int8)."""
    vt = VecType(vec_type.upper()) if isinstance(vec_type, str) else vec_type
    M = np.asarray(M, dtype=np.float32)
    if vt == VecType.FP16:
        # saturating conversion: out-of-range fp32 becomes ±inf, the
        # same intended semantics as quantize_matrix (no warning noise)
        with np.errstate(over="ignore"):
            enc = M.astype(np.float16)
    elif vt == VecType.BF16:
        enc = (
            np.ascontiguousarray(_bf16_round(M)).view(np.uint32) >> 16
        ).astype(np.uint16)
    elif vt == VecType.INT8:
        enc = np.clip(np.rint(M), -128, 127).astype(np.int8)
    elif vt == VecType.FP32:
        enc = M
    else:
        raise ValueError(f"no byte encoding for vec_type {vt.value}")
    return [r.tobytes() for r in np.ascontiguousarray(enc)]


def decode_bytes(rows: list[bytes], vec_type: VecType | str) -> np.ndarray:
    """Inverse of :func:`encode_bytes` -> fp32 matrix (exact widening)."""
    vt = VecType(vec_type.upper()) if isinstance(vec_type, str) else vec_type
    if vt == VecType.FP16:
        return np.stack(
            [np.frombuffer(b, dtype=np.float16) for b in rows]
        ).astype(np.float32)
    if vt == VecType.BF16:
        u = np.stack([np.frombuffer(b, dtype=np.uint16) for b in rows])
        return (u.astype(np.uint32) << 16).view(np.float32)
    if vt == VecType.INT8:
        return np.stack(
            [np.frombuffer(b, dtype=np.int8) for b in rows]
        ).astype(np.float32)
    if vt == VecType.FP32:
        return np.stack([np.frombuffer(b, dtype=np.float32) for b in rows])
    raise ValueError(f"no byte decoding for vec_type {vt.value}")


def roundtrip_vec_col(
    df, vec_type: VecType | str, vec_col: str = "vec", out_col: str | None = None
):
    """``encode_bytes`` → ``decode_bytes`` roundtrip of an
    ``array<float>`` column (Arrow-batched) — drives the actual WIRE
    FORMAT, not just :func:`quantize_matrix`, so an oracle over the
    output attests the storage codec's byte layout end-to-end
    (operands.h:53-147 storage semantics)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    vt = VecType(vec_type.upper()) if isinstance(vec_type, str) else vec_type

    # NOTE: no type hints on the kernel — string annotations (from
    # __future__ import annotations) break pandas_udf signature inference
    def _rt(s):
        M = np.array(list(s.to_numpy()), dtype=np.float32)
        D = decode_bytes(encode_bytes(M, vt), vt)
        return pd.Series(list(D))

    udf = F.pandas_udf(_rt, ArrayType(FloatType()))
    return df.withColumn(out_col or vec_col, udf(F.col(vec_col)))


def quantize_vec_col(df, vec_type: VecType | str, vec_col: str = "vec"):
    """Quantize an ``array<float>`` column to ``vec_type``-representable
    values (Arrow-batched; the column stays ``array<float>``)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    vt = VecType(vec_type.upper()) if isinstance(vec_type, str) else vec_type
    if vt == VecType.FP32:
        return df

    # NOTE: no type hints on the kernel — string annotations (from
    # __future__ import annotations) break pandas_udf signature inference
    def _q(s):
        M = np.array(list(s.to_numpy()), dtype=np.float32)
        Q = quantize_matrix(M, vt)
        return pd.Series(list(Q))

    qudf = F.pandas_udf(_q, ArrayType(FloatType()))
    return df.withColumn(vec_col, qudf(F.col(vec_col)))
