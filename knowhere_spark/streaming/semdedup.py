"""Streaming SemDeDup — keep-one-per-semantic-group over a document-
embedding STREAM (the batch operator is operators/semdedup; same paper,
Abbas et al. 2023).

Contract mirrors the engine's other growing structures (streaming/cc):
the quantizer is FROZEN — callers pass pinned ``centroids`` (train them
on a batch sample first), so cluster routing is stable across
micro-batches.  Keyed state per cluster holds the kept representatives'
vectors; an arriving embedding is kept iff its max cosine against the
cluster's kept set (across ALL previous batches and earlier rows of this
batch) stays below ``eps`` — first-seen-wins semantics, like the
streaming exact dedup, rather than the batch operator's
low-centroid-similarity keep rule (a stream cannot reorder the past).
Rows within a micro-batch process in ascending id for determinism.

State per cluster is O(kept_representatives x dim) floats — the
deduplicated corpus's footprint, not the stream's.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("cluster_id", IntegerType()),
        StructField("max_prior_cos", DoubleType()),   # NULL for a cluster's first
        StructField("keep", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("kept_flat", ArrayType(DoubleType()))])


def stream_semdedup(
    docs: DataFrame,
    eps: float,
    centroids: np.ndarray,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Per-row verdicts ``(id, cluster_id, max_prior_cos, keep)`` over a
    streaming frame; ``keep`` marks first-seen semantic representatives.
    ``centroids``: the frozen ``(k, dim)`` quantizer (train on a sample
    with ``functions.distance.numpy_kmeans`` or reuse a batch semdedup's
    model)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.operators.ivf import _assign_cells
    from knowhere_spark.operators.semdedup import _normalized_base

    cents = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    dim = int(cents.shape[1])
    base = _normalized_base(docs, id_col, vec_col)
    assigned = _assign_cells(base, cents).select(
        "id", F.col("cell_id").cast("int").alias("cluster_id"), "vec"
    )
    eps_f = float(eps)

    def fn(key_tuple, pdfs, state):
        import pandas as pd

        kept = (
            np.asarray(list(state.get[0]), dtype=np.float64).reshape(-1, dim)
            if state.exists
            else np.zeros((0, dim), dtype=np.float64)
        )
        cid = int(key_tuple[0])
        # the micro-batch arrives as SEVERAL Arrow chunks (split at
        # maxRecordsPerBatch and by input partition): concatenate before
        # the single ascending-id sort, or the "process in id order"
        # determinism claim silently becomes per-chunk only and the kept
        # set varies with partitioning
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out_id, out_mp, out_keep = [], [], []
        new_rows: list[np.ndarray] = []   # batch-kept rows, concatenated once
        if chunks:
            all_ids = np.concatenate([c["id"].to_numpy() for c in chunks])
            V = np.nan_to_num(
                np.concatenate(
                    [np.stack(c["vec"].to_numpy()) for c in chunks]
                ).astype(np.float64),
                nan=0.0, posinf=0.0, neginf=0.0,
            )
            order = np.argsort(all_ids, kind="stable")
            all_ids, V = all_ids[order], V[order]
            # ONE GEMM against the frozen prior kept set; the sequential
            # pass only scores against this batch's own kept rows, held in
            # a geometrically-grown buffer (no per-row reallocation of the
            # full kept matrix)
            base_max = (
                (kept @ V.T).max(axis=0)
                if len(kept)
                else np.full(len(V), -np.inf)
            )
            buf = np.empty((16, dim), dtype=np.float64)
            nb = 0
            for i in range(len(all_ids)):
                v = V[i]
                mp_val = base_max[i]
                if nb:
                    mp_val = max(mp_val, float((buf[:nb] @ v).max()))
                first = not len(kept) and nb == 0
                keep = first or mp_val < eps_f
                if keep:
                    if nb == len(buf):
                        buf = np.concatenate([buf, np.empty_like(buf)])
                    buf[nb] = v
                    nb += 1
                out_id.append(int(all_ids[i]))
                out_mp.append(None if first else float(mp_val))
                out_keep.append(keep)
            if nb:
                new_rows.append(buf[:nb])
        if new_rows:
            kept = np.concatenate([kept] + new_rows)
        state.update((kept.ravel().tolist(),))
        if out_id:
            yield pd.DataFrame(
                {
                    "id": out_id,
                    "cluster_id": np.int32(cid),
                    "max_prior_cos": pd.array(out_mp, dtype="float64"),
                    "keep": out_keep,
                }
            )

    return assigned.groupBy("cluster_id").applyInPandasWithState(
        fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
