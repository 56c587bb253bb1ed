"""Bloom-filter corpus membership — dedup/decontaminate a NEW corpus
against a PRIOR one without keeping (or shuffling) the prior corpus.

The standard Bloom construction (Bloom 1970; public literature): k bit
positions per item derived from independent seeds of the 64-bit content
fingerprint.  At 100 TB the exact-dedup groupBy against yesterday's
corpus would re-shuffle history every day; the Bloom artifact is
``m/8`` bytes total (1.2 GB holds 10⁹ items at ~1% FP), builds in ONE
pass as a tree-reduced OR of per-partition bitmaps, broadcasts to every
executor, and filters at scan speed.  False positives drop ~p extra
docs (p reported by :meth:`fp_rate`); false negatives are impossible —
the safe direction for dedup (never keeps a true duplicate).

Spark shape: build = ``mapPartitions`` partial bitmaps → ``treeReduce``
bitwise-OR (log-depth, no driver fan-in of every partial); membership =
one broadcast + an Arrow-batched kernel, zero joins and zero shuffles.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowhere_spark.functions.text import fingerprint_expr


def _positions(fp: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions from 64-bit fingerprints — the standard
    double-hashing scheme h1 + i·h2 (Kirsch & Mitzenmacher 2006), so k
    independent-enough probes come from one fingerprint without k hash
    passes."""
    u = fp.astype(np.uint64)
    h1 = u
    # odd multiplier (splitmix64 finalizer constant) keeps h2 well-mixed
    h2 = (u * np.uint64(0x9E3779B97F4A7C15)) ^ (u >> np.uint64(29))
    h2 |= np.uint64(1)   # force odd so strides cycle the full table
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


class BloomFilter:
    """An immutable membership artifact over content fingerprints."""

    def __init__(self, bits: np.ndarray, k: int, n_items: int):
        self.bits = bits              # (m/8,) uint8 bitmap
        self.k = int(k)
        self.n_items = int(n_items)   # items inserted (for fp_rate)

    @property
    def m_bits(self) -> int:
        return len(self.bits) * 8

    def fp_rate(self) -> float:
        """Expected false-positive probability at the current load —
        ``(1 - e^(-kn/m))^k``."""
        if self.n_items == 0:
            return 0.0
        return (1.0 - math.exp(-self.k * self.n_items / self.m_bits)) ** self.k

    # -- build -----------------------------------------------------------------
    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        m_bits: int = 1 << 23,
        k: int = 7,
        text_col: str = "text",
        fingerprint_col: str | None = None,
    ) -> "BloomFilter":
        """One pass over the corpus: per-partition bitmaps OR-merged with
        ``treeReduce``.  ``m_bits`` must be sized to the expected item
        count (bits-per-item ≈ 10 gives ~1% FP at k=7); the bitmap is
        driver- and broadcast-resident, so 10⁹ items ≈ 1.2 GB — the
        deliberate trade against re-shuffling a 100 TB history."""
        if m_bits % 8:
            raise ValueError(f"m_bits={m_bits} must be a multiple of 8")
        fp_expr = (
            F.col(fingerprint_col)
            if fingerprint_col is not None
            else fingerprint_expr(F.col(text_col))
        )
        src = df.select(fp_expr.cast("long").alias("fp")).filter(
            F.col("fp").isNotNull()
        )
        nbytes, kk, m = m_bits // 8, int(k), int(m_bits)

        def partial(rows):
            # (item count, bitmap) per partition: n_items rides the same
            # pass, keeping the one-pass claim true
            bits = np.zeros(nbytes, dtype=np.uint8)
            fps = np.fromiter((r["fp"] for r in rows), dtype=np.int64)
            if len(fps):
                pos = _positions(fps, kk, m).ravel()
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
            yield (len(fps), bits)

        n_items, merged = src.rdd.mapPartitions(partial).treeReduce(
            lambda a, b: (a[0] + b[0], np.bitwise_or(a[1], b[1])), depth=3
        )
        return cls(np.asarray(merged, dtype=np.uint8), kk, int(n_items))

    # -- membership -------------------------------------------------------------
    def seen_expr_frame(
        self,
        df: DataFrame,
        *,
        text_col: str = "text",
        fingerprint_col: str | None = None,
        out_col: str = "seen_before",
    ) -> DataFrame:
        """``df`` + a boolean ``out_col``: True iff the row's fingerprint
        is (probably) in the filter.  One broadcast, one Arrow kernel —
        no join, no shuffle."""
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((self.bits, self.k, self.m_bits))
        fp_expr = (
            F.col(fingerprint_col)
            if fingerprint_col is not None
            else fingerprint_expr(F.col(text_col))
        )
        from pyspark.sql.types import BooleanType, StructField, StructType

        # uniquified staging name (ADVICE r5): a caller's own "__fp"
        # column must survive the round-trip, not get overwritten+dropped
        fp_col = "__fp"
        while fp_col in df.columns:
            fp_col += "_"
        src = df.withColumn(fp_col, fp_expr.cast("long"))
        # build a FRESH StructType: .add mutates shared instances (the
        # hnsw_sharded lesson) and DataFrame.schema may hand back a cached
        # object
        out_schema = StructType(
            list(src.schema.fields) + [StructField(out_col, BooleanType())]
        )

        def kernel(batches):
            # Arrow-native (guide §4.2): only the int64 fingerprint column
            # is touched in Python; every payload column (text!) passes
            # through as Arrow buffers with zero pandas boxing — the old
            # mapInPandas round-trip boxed the full document text into
            # Python objects on BOTH boundary crossings just to append a
            # boolean
            import pyarrow as pa
            import pyarrow.compute as pc

            bits, kk, m = bc.value
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                col = rb.column(rb.schema.get_field_index(fp_col))
                null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
                fps = pc.fill_null(col, 0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64, copy=False)
                pos = _positions(fps, kk, m)
                hit = (
                    (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                ).all(axis=1)
                # NULL text → NULL fingerprint → never "seen"
                hit = np.where(null_mask, False, hit)
                yield pa.record_batch(
                    rb.columns + [pa.array(hit, type=pa.bool_())],
                    names=list(rb.schema.names) + [out_col],
                )

        return src.mapInArrow(kernel, out_schema).drop(fp_col)

    def filter_unseen(self, df: DataFrame, **kw) -> DataFrame:
        """``df`` minus rows whose content the filter has (probably) seen
        — the dedup-against-history pass.  No false negatives: a true
        duplicate NEVER survives; ~fp_rate() fresh docs are dropped as
        collateral (the safe direction)."""
        out_col = kw.pop("out_col", "__seen")
        return (
            self.seen_expr_frame(df, out_col=out_col, **kw)
            .filter(~F.col(out_col))
            .drop(out_col)
        )

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-union of two filters over the SAME (m, k) geometry —
        day-over-day history accumulation without touching either
        corpus."""
        if self.m_bits != other.m_bits or self.k != other.k:
            raise ValueError(
                f"geometry mismatch: ({self.m_bits}, {self.k}) vs"
                f" ({other.m_bits}, {other.k})"
            )
        return BloomFilter(
            np.bitwise_or(self.bits, other.bits),
            self.k,
            self.n_items + other.n_items,   # upper bound (overlap unknown)
        )

    # -- persistence --------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {"k": self.k, "n_items": self.n_items, "m_bits": self.m_bits}, f
            )
        self.bits.tofile(os.path.join(path, "bits.bin"))

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        bits = np.fromfile(os.path.join(path, "bits.bin"), dtype=np.uint8)
        if len(bits) * 8 != int(meta["m_bits"]):
            raise ValueError(f"bitmap size {len(bits)*8} != meta {meta['m_bits']}")
        return cls(bits, int(meta["k"]), int(meta["n_items"]))
