"""Shared Spark session + deterministic vector fixtures.

Fixture generators mirror the reference's test data (tests/ut/utils.h:41-50:
uniform floats in [0,100), seed 42; binary utils.h:65-75; sparse
utils.h:401-455) per FIXTURES.md.  The exact brute-force oracle is computed
in numpy — the same ground-truth procedure as the reference
(tests/ut/test_search.cc:144-151).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

SEED = 42
TESTDATA = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("knowhere-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module", autouse=True)
def _clear_cache_module(spark):
    """Drop leftover cached blocks at module boundaries: the session JVM
    is shared across ~240 tests and accumulated caches otherwise OOM the
    heap near the tail of a full run (observed on test_hnsw_quant)."""
    yield
    try:
        spark.catalog.clearCache()
    except Exception:
        pass


# --- deterministic generators (FIXTURES.md T1-T6) -------------------------

def gen_dense(n: int, dim: int, seed: int = SEED) -> np.ndarray:
    """U[0,100) floats — GenDataSet analog (utils.h:41-50)."""
    rng = np.random.default_rng(seed)
    return (rng.random((n, dim)) * 100.0).astype(np.float32)


def gen_binary(n: int, dim: int, seed: int = SEED) -> np.ndarray:
    """dim/8 random bytes per row — GenBinDataSet (utils.h:65-75)."""
    assert dim % 8 == 0
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, dim // 8), dtype=np.uint8)


def gen_sparse(n: int, dim: int, sparsity: float, seed: int = SEED):
    """List of dicts term→value — GenSparseDataSet (utils.h:401-426)."""
    rng = np.random.default_rng(seed)
    nnz = max(1, int(dim * (1.0 - sparsity)))
    rows = []
    for _ in range(n):
        idx = np.sort(rng.choice(dim, size=nnz, replace=False))
        vals = rng.random(nnz).astype(np.float32) + 0.01
        rows.append({int(i): float(v) for i, v in zip(idx, vals)})
    return rows


DENSE_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("vec", ArrayType(FloatType()))]
)
QUERY_SCHEMA = StructType(
    [StructField("query_id", LongType()), StructField("vec", ArrayType(FloatType()))]
)
BIN_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("vec", BinaryType())]
)
BIN_QUERY_SCHEMA = StructType(
    [StructField("query_id", LongType()), StructField("vec", BinaryType())]
)


def dense_df(spark, mat: np.ndarray, schema=DENSE_SCHEMA):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)], schema
    )


def binary_df(spark, mat: np.ndarray, schema=BIN_SCHEMA):
    return spark.createDataFrame(
        [(i, bytes(row.tobytes())) for i, row in enumerate(mat)], schema
    )


# --- numpy oracles (test_search.cc ground-truth pattern) -------------------

def np_distances(base: np.ndarray, queries: np.ndarray, metric: str) -> np.ndarray:
    X = base.astype(np.float64)
    Q = queries.astype(np.float64)
    if metric == "L2":
        return ((X[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2)
    if metric == "IP":
        return X @ Q.T
    if metric == "COSINE":
        xn = np.linalg.norm(X, axis=1, keepdims=True)
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        return (X / xn) @ (Q / qn).T
    raise ValueError(metric)


def np_knn(base: np.ndarray, queries: np.ndarray, k: int, metric: str):
    """Exact top-k, ties by (distance, id) — returns dict query->list[(id, dist)]."""
    d = np_distances(base, queries, metric)      # (nb, nq)
    sim = metric in ("IP", "COSINE")
    out = {}
    for q in range(d.shape[1]):
        key = -d[:, q] if sim else d[:, q]
        order = np.lexsort((np.arange(len(key)), key))
        out[q] = [(int(i), float(d[i, q])) for i in order[:k]]
    return out


def recall_at_k(result: dict, truth: dict, k: int) -> float:
    """GetKNNRecall analog (tests/ut/utils.h:110-135)."""
    hits = total = 0
    for q, tr in truth.items():
        t_ids = {i for i, _ in tr[:k]}
        r_ids = {i for i, _ in result.get(q, [])[:k]}
        hits += len(t_ids & r_ids)
        total += len(t_ids)
    return hits / total if total else 0.0
