"""Multimodal columns — image/audio/video as opaque ``BINARY`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

This is the training-data-pipeline extension beyond the reference's
operator set (the reference is vectors-only; these stages *produce* the
vectors its indexes consume).  The Spark-side plumbing — schema,
partition-preserving batch transforms, UDF signatures, batch shapes — is
real and tested; the codec kernels themselves are STUBBED (this
environment has no image/audio libraries): ``decode_payload`` raises
``NotImplementedError`` for real codecs and provides a deterministic
fake (seeded by payload bytes) so every downstream stage is exercised
end-to-end with stable results.

Layout contract at 100 TB: payloads live in their own column so Parquet
column pruning skips the heavy bytes for metadata-only queries; feature
extraction streams batches (``mapInPandas``) without ever collecting a
partition into one object.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal schema — one row per media object
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

_REAL_CODECS = False   # no PIL/ffmpeg in this environment


def decode_payload(payload: bytes, media_type: str, meta: dict) -> np.ndarray:
    """Decode one payload to a pixel/sample array.

    STUB: with real codecs installed this would be
    ``PIL.Image.open``/``soundfile.read``/frame demux — that branch
    raises ``NotImplementedError`` here.  The deterministic fake derives
    the array from a hash of the payload, so outputs are stable across
    runs/executors and shape-correct for downstream stages.
    """
    if _REAL_CODECS:   # pragma: no cover
        raise NotImplementedError("real image/audio codecs not available")
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    if media_type == "image":
        return rng.random((meta["height"], meta["width"], 3), dtype=np.float64)
    if media_type == "audio":
        return rng.random(meta["sample_rate"], dtype=np.float64)   # 1s clip
    if media_type == "video":
        return rng.random((meta["n_frames"], meta["height"], meta["width"]), dtype=np.float64)
    raise ValueError(f"unknown media_type {media_type!r}")


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table —
    payload = utf-8 text bytes, metadata from portable arithmetic
    (``length(text)*31 + doc_id`` — identical in any engine, unlike
    murmur ``F.hash``).  Purely for exercising the pipeline against
    driver testdata; a real corpus reads ``(media_id, payload, meta)``
    parquet directly."""
    h = F.length("text") * F.lit(31) + F.col("doc_id").cast("long")
    return documents.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(h, F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.pmod(h, F.lit(48)) + 16).cast("int").alias("width"),
            (F.pmod(h, F.lit(32)) + 16).cast("int").alias("height"),
            (F.pmod(h, F.lit(10)) + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Decode + global-pool each payload into a ``feature_dim`` vector —
    the embed step of a multimodal training pipeline, streaming Arrow batches.

    Returns ``(media_id, media_type, features ARRAY<FLOAT>)``; the
    feature kernel (mean-pooled chunks of the decoded array) is real,
    only the codec underneath is the deterministic fake."""

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload, mtype, meta in zip(
                pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                arr = decode_payload(bytes(payload), mtype, dict(meta)).ravel()
                # mean-pool into feature_dim equal chunks (pad to multiple)
                pad = (-len(arr)) % feature_dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad)])
                feats.append(arr.reshape(feature_dim, -1).mean(axis=1).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    from knowhere_spark.session import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(kernel, schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: decode → (fake) resample → re-encode; metadata is
    updated for real, payload is the stub re-encoding (raw float bytes of
    the resized array's first 64 values — stable and size-bounded)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_payload = []
            out_meta = []
            for payload, mtype, meta in zip(
                pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                meta = dict(meta)
                if mtype == "image":
                    arr = decode_payload(bytes(payload), mtype, meta)
                    # nearest-neighbor index resample (a real kernel over the
                    # fake decode)
                    yi = np.linspace(0, arr.shape[0] - 1, height).astype(int)
                    xi = np.linspace(0, arr.shape[1] - 1, width).astype(int)
                    resized = arr[yi][:, xi]
                    out_payload.append(resized.ravel()[:64].astype(np.float32).tobytes())
                    meta["width"], meta["height"] = width, height
                else:
                    out_payload.append(bytes(payload))
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video rows — a *native* explode over the frame
    index sequence (no Python): one output row per kept frame.  The
    payload stays opaque; a downstream decode stage picks the frame.
    Returns ``(media_id, frame_idx)`` plus passthrough metadata columns.
    """
    return (
        media.filter(
            (F.col("media_type") == "video") & (F.col("meta.n_frames") > 0)
        )  # n_frames=0 would make sequence(0, -1, +step) throw; zero rows is right
        .select(
            "media_id",
            F.col("meta.n_frames").alias("n_frames"),
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )
