"""Random-hyperplane LSH over embedding columns — the bucketed scale path
for cosine similarity search and semantic near-dup (the brute-force
operators in brute_force.py / dedup.py are the exact baselines).

Not a reference operator (Knowhere's ANN structures are IVF/graph);
this is the training-pipeline extension for 100 TB corpora: sign-bit
signatures put similar vectors in the same bucket, so candidate
generation is a groupBy/join on bucket keys instead of an all-pairs
distance join.  Exact cosine re-scores candidates, so precision is 1.0
and only recall depends on the banding (`n_tables` OR-amplification:
P[candidate] = 1 - (1 - p^n_bits)^n_tables with p = 1 - angle/pi).

Plan shape: signatures via one GEMM kernel (X @ H > 0, packed to one
BIGINT per table), candidates via joins on (table, bucket) — both
shuffle-light and partition-friendly (bucket keys distribute evenly by
construction).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from knowhere_spark.functions.distance import cosine_expr
from knowhere_spark.operators.topk import topk_per_key

_SIG_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("table", IntegerType()),
        StructField("bucket", LongType()),
    ]
)


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_signatures(
    df: DataFrame,
    *,
    dim: int,
    n_bits: int = 12,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Long-form ``(id, table, bucket)`` sign-bit signatures — one GEMM
    against the broadcast hyperplane tensor per Arrow batch."""
    H = _hyperplanes(dim, n_bits, n_tables, seed)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(H)
    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = bc.value
        nt, nb, _ = planes.shape
        weights = (1 << np.arange(nb, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["vec"].to_numpy()), dtype=np.float64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            frames = []
            for t in range(nt):
                bits = (X @ planes[t].T) > 0                    # (n, nb)
                buckets = bits.astype(np.int64) @ weights       # (n,)
                frames.append(
                    pd.DataFrame({"id": ids, "table": t, "bucket": buckets})
                )
            yield pd.concat(frames)

    from knowhere_spark.session import ensure_parallelism

    return ensure_parallelism(src).mapInPandas(kernel, _SIG_SCHEMA)


class LshIndex:
    """Bucketed cosine index: base vectors + their signatures."""

    def __init__(
        self,
        base: DataFrame,          # (id, vec)
        signatures: DataFrame,    # (id, table, bucket)
        *,
        dim: int,
        n_bits: int,
        n_tables: int,
        seed: int,
    ):
        self.base = base
        self.signatures = signatures
        self.dim = dim
        self.n_bits = n_bits
        self.n_tables = n_tables
        self.seed = seed

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        dim: int,
        n_bits: int = 12,
        n_tables: int = 8,
        seed: int = 42,
        id_col: str = "id",
        vec_col: str = "vec",
    ) -> "LshIndex":
        base = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        sigs = lsh_signatures(
            base, dim=dim, n_bits=n_bits, n_tables=n_tables, seed=seed
        ).cache()
        return cls(
            base, sigs, dim=dim, n_bits=n_bits, n_tables=n_tables, seed=seed
        )

    def search(
        self,
        query_df: DataFrame,
        k: int,
        *,
        query_id_col: str = "query_id",
        query_vec_col: str = "vec",
    ) -> DataFrame:
        """Top-k by exact cosine among bucket-sharing candidates."""
        queries = query_df.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        )
        qsigs = lsh_signatures(
            queries,
            dim=self.dim, n_bits=self.n_bits, n_tables=self.n_tables,
            seed=self.seed, id_col="query_id", vec_col="qvec",
        ).withColumnRenamed("id", "query_id")
        cand = (
            self.signatures.join(F.broadcast(qsigs), ["table", "bucket"])
            .select("query_id", "id")
            .distinct()
        )
        scored = (
            cand.join(self.base, "id")
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                F.col("id").alias("neighbor_id"),
                cosine_expr(F.col("vec"), F.col("qvec")).alias("distance"),
            )
        )
        return topk_per_key(
            scored, "query_id", "distance", k, ascending=False, tie_breaker="neighbor_id"
        )

    def neardup_pairs(self, threshold: float) -> DataFrame:
        """Pairs with exact cosine >= threshold among bucket-sharing
        candidates — the LSH-bucketed scale path for
        dedup.embedding_neardup_pairs (same output schema)."""
        left = self.signatures.select(
            F.col("id").alias("id_a"), "table", "bucket"
        )
        right = self.signatures.select(
            F.col("id").alias("id_b"), "table", "bucket"
        )
        cand = (
            left.join(right, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        a = self.base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = self.base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        scored = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                cosine_expr(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
            )
        )
        return scored.filter(F.col("cosine") >= threshold)
