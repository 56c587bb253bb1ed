"""Binary-vector metrics over packed-bit ``BinaryType`` columns.

Reference: HAMMING popcount(xor), JACCARD 1-|and|/|or|, SUBSTRUCTURE /
SUPERSTRUCTURE containment (``binary_knn_mc`` — match-collect, no heap)
— src/common/comp/brute_force.cc:212-236; packed layout dim/8 bytes/row
(tests/ut/utils.h:65-75).

Implemented as Arrow-batched pandas UDFs (numpy ``bitwise_*`` +
``unpackbits`` popcount) — the vectorized slow-path escape hatch the
built-in SQL functions genuinely can't express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType

from knowhere_spark.config import MetricType


def _to_matrix(s: pd.Series) -> np.ndarray:
    """Stack a pandas Series of equal-length byte strings → (n, nbytes) uint8."""
    return np.frombuffer(b"".join(s.to_numpy()), dtype=np.uint8).reshape(len(s), -1)


def hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise popcount(xor) of two (n, nbytes) uint8 matrices."""
    return np.unpackbits(np.bitwise_xor(a, b), axis=1).sum(axis=1).astype(np.float64)


def jaccard_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    inter = np.unpackbits(np.bitwise_and(a, b), axis=1).sum(axis=1).astype(np.float64)
    union = np.unpackbits(np.bitwise_or(a, b), axis=1).sum(axis=1).astype(np.float64)
    out = np.ones_like(inter)
    nz = union > 0
    out[nz] = 1.0 - inter[nz] / union[nz]
    return out


@F.pandas_udf(DoubleType())
def hamming_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(hamming_np(_to_matrix(a), _to_matrix(b)))


@F.pandas_udf(DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(jaccard_np(_to_matrix(a), _to_matrix(b)))


@F.pandas_udf(BooleanType())
def substructure_udf(base: pd.Series, query: pd.Series) -> pd.Series:
    """query is substructure of base: every bit of query present in base
    ((q & b) == q) — brute_force.cc:229-236 match-only semantics."""
    b = _to_matrix(base)
    q = _to_matrix(query)
    return pd.Series((np.bitwise_and(q, b) == q).all(axis=1))


@F.pandas_udf(BooleanType())
def superstructure_udf(base: pd.Series, query: pd.Series) -> pd.Series:
    """base is substructure of query ((q & b) == b)."""
    b = _to_matrix(base)
    q = _to_matrix(query)
    return pd.Series((np.bitwise_and(q, b) == b).all(axis=1))


def binary_distance_expr(metric: MetricType, base: Column, query: Column) -> Column:
    metric = MetricType(metric)
    if metric == MetricType.HAMMING:
        return hamming_udf(base, query)
    if metric == MetricType.JACCARD:
        return jaccard_udf(base, query)
    raise ValueError(f"binary_distance_expr does not support {metric}")


def structure_match_expr(metric: MetricType, base: Column, query: Column) -> Column:
    metric = MetricType(metric)
    if metric == MetricType.SUBSTRUCTURE:
        return substructure_udf(base, query)
    if metric == MetricType.SUPERSTRUCTURE:
        return superstructure_udf(base, query)
    raise ValueError(f"structure_match_expr does not support {metric}")
