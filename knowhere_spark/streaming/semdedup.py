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
        out_id, out_mp, out_keep = [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            order = np.argsort(pdf["id"].to_numpy(), kind="stable")
            ids = pdf["id"].to_numpy()[order]
            V = np.nan_to_num(
                np.stack(pdf["vec"].to_numpy())[order].astype(np.float64),
                nan=0.0, posinf=0.0, neginf=0.0,
            )
            for i in range(len(ids)):
                v = V[i]
                mp = float((kept @ v).max()) if len(kept) else None
                keep = mp is None or mp < eps_f
                if keep:
                    kept = np.vstack([kept, v[None, :]])
                out_id.append(int(ids[i]))
                out_mp.append(mp)
                out_keep.append(keep)
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
