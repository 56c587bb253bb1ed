"""Media ingestion source — a directory of raw media files into the
canonical :data:`~knowhere_spark.operators.multimodal.MEDIA_SCHEMA`.

Built on Spark's ``binaryFile`` source (one row per file: path,
modificationTime, length, content), which at 100 TB is the layout an
object-store crawl lands in: listing parallelizes across executors,
``pathGlobFilter`` prunes at the listing, and payload bytes stay in
their own column so metadata-only queries never read them.

Two stages, both cheap:

1. **Type sniff** (:func:`read_media_directory`): magic-byte dispatch
   to image / audio / video, the same :func:`sniff_format` table the
   decoders use.  Unrecognized files are kept with ``media_type
   'binary'`` (or dropped with ``keep_unknown=False``) — a crawl
   pipeline decides downstream, not at ingest.
2. **Header probe** (:func:`probe_media_meta`): real width / height /
   frame-count / sample-rate out of format HEADERS only — PNG IHDR,
   GIF logical screen + block walk, JPEG SOF scan, BMP/PNM headers,
   WAV fmt chunk, FLAC STREAMINFO, MP4 ``moov`` sample tables — never
   a pixel decode.
   At ingest scale the header probe is what populates the typed
   metadata column the pipeline partitions and filters on.
"""

from __future__ import annotations

import io
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowhere_spark.operators.multimodal import MEDIA_SCHEMA, sniff_format

#: sniff format → media_type
_FORMAT_TYPE = {
    "pnm": "image",
    "bmp": "image",
    "png": "image",
    "jpeg": "image",
    "gif": "video",   # may be single-frame; the header probe sets n_frames
    "wav": "audio",
    "flac": "audio",
    "mp4": "video",
}


def probe_meta(payload: bytes) -> dict:
    """Header-only metadata for one payload: ``{"width", "height",
    "n_frames", "sample_rate"}`` (missing fields None).  Parses format
    HEADERS exclusively — no entropy decode, no pixel pass — so it runs
    at listing speed over a crawl.  Unrecognized or corrupt headers
    return all-None (ingest must be total)."""
    out = {"width": None, "height": None, "n_frames": None, "sample_rate": None}
    try:
        fmt = sniff_format(payload)
        if fmt == "png":
            # IHDR is always the first chunk: dims at offset 16
            w, h = struct.unpack_from(">II", payload, 16)
            out.update(width=w, height=h, n_frames=1)
        elif fmt == "bmp":
            w, h = struct.unpack_from("<ii", payload, 18)
            out.update(width=w, height=abs(h), n_frames=1)
        elif fmt == "gif":
            w, h = struct.unpack_from("<HH", payload, 6)
            out.update(width=w, height=h, n_frames=_gif_frame_count(payload))
        elif fmt == "jpeg":
            dims = _jpeg_dims(payload)
            if dims:
                out.update(width=dims[0], height=dims[1], n_frames=1)
        elif fmt == "pnm":
            dims = _pnm_dims(payload)
            if dims:
                out.update(width=dims[0], height=dims[1], n_frames=1)
        elif fmt == "wav":
            import wave

            with wave.open(io.BytesIO(payload)) as f:
                out.update(
                    sample_rate=f.getframerate(), n_frames=f.getnframes()
                )
        elif fmt == "flac":
            # STREAMINFO is a fixed-layout header block — no frame decode
            from knowhere_spark.functions.flac import decode_flac_meta

            mi = decode_flac_meta(payload)
            out.update(
                sample_rate=mi["sample_rate"],
                n_frames=mi["total_samples"] or None,
            )
        elif fmt == "mp4":
            from knowhere_spark.functions.mp4 import parse_mp4

            video = [
                t for t in parse_mp4(payload)["tracks"]
                if t["handler"] == "vide"
            ]
            if video:
                t = video[0]
                out.update(
                    width=int(t["width"]), height=int(t["height"]),
                    n_frames=t["n_samples"],
                )
    except Exception:
        pass   # corrupt header → all-None, the row survives
    return out


def _gif_frame_count(data: bytes) -> int | None:
    """Count image descriptors by walking block LENGTHS (sub-block skip
    is pure pointer arithmetic — the LZW payload is never touched)."""
    pos = 13
    packed = data[10]
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:          # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:        # image descriptor
            fpacked = data[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1           # LZW min code size
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            n += 1
        else:
            return n or None
    return n or None


def _jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """First SOFn frame dims via the SHARED marker walker
    (functions/jpeg.iter_jpeg_segments — fill bytes and standalone
    markers handled identically to the decoder)."""
    from knowhere_spark.functions.jpeg import iter_jpeg_segments

    try:
        for marker, _seg, body_start, _end in iter_jpeg_segments(data):
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                _prec, h, w = struct.unpack_from(">BHH", data, body_start)
                return w, h
            if marker == 0xDA:
                return None
    except ValueError:
        return None
    return None


def _pnm_dims(data: bytes) -> tuple[int, int] | None:
    pos, fields = 2, []
    while len(fields) < 2 and pos < min(len(data), 256):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        fields.append(int(data[pos:end]))
        pos = end
    return (fields[0], fields[1]) if len(fields) == 2 else None


def probe_media_meta(media: DataFrame) -> DataFrame:
    """Fill the ``meta`` struct by header-probing every payload
    (:func:`probe_meta`) — one Arrow-batched pass, no decode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                probe_meta(bytes(p)) for p in pdf["payload"]
            ]
            yield pdf

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def read_media_directory(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
    keep_unknown: bool = True,
    probe: bool = True,
) -> DataFrame:
    """Read a directory of raw media files into :data:`MEDIA_SCHEMA`.

    ``media_id`` is ``xxhash64(path)`` (stable across re-ingests of the
    same layout); ``media_type`` comes from the magic-byte sniff;
    ``meta`` from the header probe (``probe=False`` leaves it null for
    a listing-speed pass).  ``glob`` maps to ``pathGlobFilter`` so
    pruning happens at the file listing, before any bytes are read."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE pass computes both the type and (when asked) the header
        # probe — two back-to-back kernels would push every payload
        # through Arrow twice at crawl scale
        for pdf in batches:
            types, metas = [], []
            for p in pdf["payload"]:
                p = bytes(p)
                fmt = sniff_format(p)
                mtype = _FORMAT_TYPE.get(fmt, "binary")
                meta = probe_meta(p) if probe else None
                if fmt == "gif":
                    # the sniff can't see frame count; the header block
                    # walk can — a static GIF is an image.  Reuse the
                    # probe's walk when available (don't pay it twice)
                    if meta is not None:
                        n_frames = meta["n_frames"] or 1
                    else:
                        try:
                            n_frames = _gif_frame_count(p) or 1
                        except Exception:
                            n_frames = 1
                    mtype = "video" if n_frames > 1 else "image"
                types.append(mtype)
                metas.append(meta)
            pdf = pdf.copy()
            pdf["media_type"] = types
            pdf["meta"] = metas
            yield pdf

    base = raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(None).cast("string").alias("media_type"),
        F.col("content").alias("payload"),
        F.lit(None).cast(MEDIA_SCHEMA["meta"].dataType).alias("meta"),
    ).mapInPandas(kernel, MEDIA_SCHEMA)
    if not keep_unknown:
        base = base.filter(F.col("media_type") != "binary")
    return base
