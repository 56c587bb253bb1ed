"""MP4 / ISO-BMFF container parser — pure stdlib + numpy.

Decoding the video CODEC inside an MP4 (H.264/H.265/AV1) genuinely needs
ffmpeg, which this environment lacks — that stays an injected decoder in
operators/multimodal.py.  But the CONTAINER is a plain box format, and
everything a frame-sampling pipeline needs from it is metadata:

- which byte ranges of ``mdat`` are samples (frames),
- which samples are sync samples (keyframes — the ones a sampler wants,
  because they decode without reference frames),
- each sample's decode timestamp in seconds,
- track geometry (width/height) and codec fourcc.

``parse_mp4`` walks the box tree (``moov → trak → mdia → minf → stbl``)
and materializes the full per-sample table from the five sample-table
atoms (``stts`` timestamps, ``stsz`` sizes, ``stsc`` sample→chunk,
``stco``/``co64`` chunk offsets, ``stss`` sync samples).  64-bit box
sizes and ``co64`` are handled; fragmented MP4 (``moof``) and encrypted
tracks are recognized and raise ``NotImplementedError`` (the honest-stub
contract shared with progressive JPEG / Adam7 PNG).  Structurally
invalid payloads raise ``ValueError`` so callers can fall back.

ISO/IEC 14496-12 is the public spec; box offsets below cite its section
numbers.
"""

from __future__ import annotations

import struct

import numpy as np

#: containers whose payload is just more boxes (14496-12 §8)
_CONTAINER_BOXES = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta",
}


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield ``(type, body_start, body_end)`` for each box in
    ``data[start:end]``.  Handles 32-bit sizes, 64-bit ``largesize``
    (size == 1) and to-end-of-file (size == 0)."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", data, pos)
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("mp4 largesize truncated")
            size = struct.unpack_from(">Q", data, body)[0]
            body += 8
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"mp4 box {typ!r} overruns payload")
        yield typ, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("mp4 trailing garbage after last box")


def _find_boxes(data: bytes, start: int, end: int) -> dict[bytes, list[tuple[int, int]]]:
    out: dict[bytes, list[tuple[int, int]]] = {}
    for typ, b, e in iter_boxes(data, start, end):
        out.setdefault(typ, []).append((b, e))
    return out


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """Returns (version, position after the version/flags word)."""
    return data[start], start + 4


def _parse_stbl(data: bytes, start: int, end: int) -> dict:
    """Expand the five sample-table atoms into one per-sample table
    (numpy arrays: offset, size, dts_ticks, is_sync) + codec fourcc."""
    boxes = _find_boxes(data, start, end)

    def one(name: bytes, required: bool = True):
        got = boxes.get(name)
        if not got:
            if required:
                raise ValueError(f"mp4 stbl missing {name!r}")
            return None
        return got[0]

    # stsd → codec fourcc of the first sample entry (§8.5.2)
    sd_b, sd_e = one(b"stsd")
    _, p = _fullbox(data, sd_b)
    n_entries = struct.unpack_from(">I", data, p)[0]
    codec = None
    if n_entries and p + 12 <= sd_e:
        codec = data[p + 8 : p + 12].decode("latin-1")

    # stsz (§8.7.3): uniform size or per-sample sizes
    sz_b, _ = one(b"stsz")
    _, p = _fullbox(data, sz_b)
    uniform, n_samples = struct.unpack_from(">II", data, p)
    if uniform:
        sizes = np.full(n_samples, uniform, dtype=np.int64)
    else:
        sizes = np.frombuffer(
            data, dtype=">u4", count=n_samples, offset=p + 8
        ).astype(np.int64)

    # stts (§8.6.1.2): run-length (count, delta) → per-sample dts ticks
    tt_b, _ = one(b"stts")
    _, p = _fullbox(data, tt_b)
    n_runs = struct.unpack_from(">I", data, p)[0]
    runs = np.frombuffer(data, dtype=">u4", count=n_runs * 2, offset=p + 4)
    counts, deltas = runs[0::2].astype(np.int64), runs[1::2].astype(np.int64)
    if int(counts.sum()) != n_samples:
        raise ValueError("mp4 stts sample count mismatch with stsz")
    per_sample_delta = np.repeat(deltas, counts)
    dts = np.concatenate([[0], np.cumsum(per_sample_delta)[:-1]])

    # stsc (§8.7.4): (first_chunk, samples_per_chunk, _) runs
    sc_b, _ = one(b"stsc")
    _, p = _fullbox(data, sc_b)
    n_sc = struct.unpack_from(">I", data, p)[0]
    sc = np.frombuffer(data, dtype=">u4", count=n_sc * 3, offset=p + 4)
    first_chunk = sc[0::3].astype(np.int64)   # 1-based
    per_chunk = sc[1::3].astype(np.int64)

    # stco / co64 (§8.7.5): chunk byte offsets
    co = boxes.get(b"stco")
    if co:
        _, p = _fullbox(data, co[0][0])
        n_chunks = struct.unpack_from(">I", data, p)[0]
        chunk_off = np.frombuffer(
            data, dtype=">u4", count=n_chunks, offset=p + 4
        ).astype(np.int64)
    else:
        co = boxes.get(b"co64")
        if not co:
            raise ValueError("mp4 stbl missing stco/co64")
        _, p = _fullbox(data, co[0][0])
        n_chunks = struct.unpack_from(">I", data, p)[0]
        chunk_off = np.frombuffer(
            data, dtype=">u8", count=n_chunks, offset=p + 4
        ).astype(np.int64)

    # expand stsc runs to samples-per-chunk for every chunk
    if n_chunks:
        if len(first_chunk) == 0 or first_chunk[0] != 1:
            raise ValueError("mp4 stsc must start at chunk 1")
        run_end = np.concatenate([first_chunk[1:], [n_chunks + 1]])
        chunk_samples = np.repeat(per_chunk, (run_end - first_chunk))
        if len(chunk_samples) != n_chunks:
            raise ValueError("mp4 stsc chunk expansion mismatch")
    else:
        chunk_samples = np.zeros(0, dtype=np.int64)
    if int(chunk_samples.sum()) != n_samples:
        raise ValueError("mp4 stsc/stsz sample count mismatch")

    # per-sample offsets: chunk base + cumulative sizes within the chunk
    sample_chunk = np.repeat(np.arange(n_chunks), chunk_samples)
    base = chunk_off[sample_chunk]
    csum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    chunk_start_csum = np.concatenate(
        [[0], np.cumsum(chunk_samples)[:-1]]
    )   # index of each chunk's first sample
    within = csum - csum[chunk_start_csum][sample_chunk]
    offsets = base + within

    # stss (§8.6.2): sync samples, 1-based; absent → every sample syncs
    sync = np.ones(n_samples, dtype=bool)
    ss = boxes.get(b"stss")
    if ss:
        _, p = _fullbox(data, ss[0][0])
        n_ss = struct.unpack_from(">I", data, p)[0]
        nums = np.frombuffer(data, dtype=">u4", count=n_ss, offset=p + 4)
        sync = np.zeros(n_samples, dtype=bool)
        idx = nums.astype(np.int64) - 1
        if len(idx) and (idx.min() < 0 or idx.max() >= n_samples):
            raise ValueError("mp4 stss sample number out of range")
        sync[idx] = True

    return {
        "codec": codec,
        "n_samples": int(n_samples),
        "offsets": offsets,
        "sizes": sizes,
        "dts_ticks": dts,
        "is_sync": sync,
    }


def parse_mp4(data: bytes) -> dict:
    """Parse an ISO-BMFF payload into track metadata + per-sample tables.

    Returns ``{"brand": str, "tracks": [{"track_id", "handler", "codec",
    "width", "height", "timescale", "duration_sec", "n_samples",
    "offsets", "sizes", "dts_sec", "is_sync"}, ...]}``.  Raises
    ``NotImplementedError`` for fragmented (``moof``) files and
    ``ValueError`` for structurally invalid ones."""
    top = _find_boxes(data, 0, len(data))
    if b"moof" in top:
        raise NotImplementedError("fragmented MP4 (moof) not supported")
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("mp4 missing ftyp/moov")
    fb, fe = top[b"ftyp"][0]
    brand = data[fb : fb + 4].decode("latin-1") if fe - fb >= 4 else ""

    mb, me = top[b"moov"][0]
    moov = _find_boxes(data, mb, me)
    tracks = []
    for tb, te in moov.get(b"trak", []):
        trak = _find_boxes(data, tb, te)
        # tkhd (§8.3.2): track id + 16.16 fixed width/height at the tail
        kb, ke = trak[b"tkhd"][0]
        ver, p = _fullbox(data, kb)
        if ver == 1:
            track_id = struct.unpack_from(">I", data, p + 16)[0]
        else:
            track_id = struct.unpack_from(">I", data, p + 8)[0]
        width = struct.unpack_from(">I", data, ke - 8)[0] / 65536.0
        height = struct.unpack_from(">I", data, ke - 4)[0] / 65536.0

        mdia = _find_boxes(data, *trak[b"mdia"][0])
        hb, _ = mdia[b"hdlr"][0]
        _, p = _fullbox(data, hb)
        handler = data[p + 4 : p + 8].decode("latin-1")
        db, _ = mdia[b"mdhd"][0]
        ver, p = _fullbox(data, db)
        if ver == 1:
            timescale, duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            timescale, duration = struct.unpack_from(">II", data, p + 8)
        if timescale == 0:
            raise ValueError("mp4 mdhd timescale 0")

        minf = _find_boxes(data, *mdia[b"minf"][0])
        st = _parse_stbl(data, *minf[b"stbl"][0])
        for off, sz in zip(st["offsets"], st["sizes"]):
            if off + sz > len(data):
                raise ValueError("mp4 sample range outside payload")
        tracks.append(
            {
                "track_id": int(track_id),
                "handler": handler,
                "codec": st["codec"],
                "width": width,
                "height": height,
                "timescale": int(timescale),
                "duration_sec": duration / timescale,
                "n_samples": st["n_samples"],
                "offsets": st["offsets"],
                "sizes": st["sizes"],
                "dts_sec": st["dts_ticks"] / timescale,
                "is_sync": st["is_sync"],
            }
        )
    if not tracks:
        raise ValueError("mp4 moov contains no tracks")
    return {"brand": brand, "tracks": tracks}


def video_keyframes(
    data: bytes, *, every_n: int = 1, max_frames: int | None = None
) -> list[dict]:
    """Sync-sample (keyframe) extraction from the first video track:
    returns ``[{"frame_idx", "pts_sec", "payload", "codec"}, ...]`` where
    ``payload`` is the sample's REAL byte range out of ``mdat`` —
    exactly what an injected codec decoder consumes.  ``every_n`` keeps
    every n-th sync sample (temporal subsampling)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    parsed = parse_mp4(data)
    video = [t for t in parsed["tracks"] if t["handler"] == "vide"]
    if not video:
        raise ValueError("mp4 has no video track")
    t = video[0]
    sync_idx = np.nonzero(t["is_sync"])[0][::every_n]
    if max_frames is not None:
        sync_idx = sync_idx[:max_frames]
    return [
        {
            "frame_idx": int(i),
            "pts_sec": float(t["dts_sec"][i]),
            "payload": data[t["offsets"][i] : t["offsets"][i] + t["sizes"][i]],
            "codec": t["codec"],
        }
        for i in sync_idx
    ]
