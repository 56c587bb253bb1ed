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
sizes and ``co64`` are handled.  Fragmented MP4 — the ``moof``/``traf``/
``trun`` layout DASH/HLS streaming crawls actually produce — is parsed
too: ``mvex/trex`` defaults, ``tfhd`` overrides, ``tfdt`` decode times
and per-sample ``trun`` entries merge into the same per-track sample
table, with sync flags taken from the ``sample_is_non_sync_sample`` bit.
Structurally invalid payloads raise ``ValueError`` so callers can fall
back.

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
    """Yield ``(type, body_start, body_end, box_start)`` for each box in
    ``data[start:end]``.  Handles 32-bit sizes, 64-bit ``largesize``
    (size == 1) and to-end-of-file (size == 0).  ``box_start`` is the
    offset of the box HEADER — what default-base-is-moof sample offsets
    are relative to (body_start - 8 would be wrong for a largesize
    header, which is 16 bytes)."""
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
        yield typ, body, pos + size, pos
        pos += size
    if pos != end:
        raise ValueError("mp4 trailing garbage after last box")


def _find_boxes(data: bytes, start: int, end: int) -> dict[bytes, list[tuple[int, int]]]:
    out: dict[bytes, list[tuple[int, int]]] = {}
    for typ, b, e, _ in iter_boxes(data, start, end):
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
    if n_samples:
        dts = np.concatenate([[0], np.cumsum(per_sample_delta)[:-1]])
    else:
        dts = np.zeros(0, dtype=np.int64)   # empty fMP4 init stbl

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


#: tfhd flag bits (14496-12 §8.8.7)
_TFHD_BASE_DATA_OFFSET = 0x000001
_TFHD_SAMPLE_DESC_IDX = 0x000002
_TFHD_DEFAULT_DURATION = 0x000008
_TFHD_DEFAULT_SIZE = 0x000010
_TFHD_DEFAULT_FLAGS = 0x000020
_TFHD_DEFAULT_BASE_IS_MOOF = 0x020000

#: trun flag bits (14496-12 §8.8.8)
_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_SAMPLE_FLAGS = 0x000004
_TRUN_SAMPLE_DURATION = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTS = 0x000800

#: sample_flags bit: sample does NOT decode standalone (§8.8.3.1)
_SAMPLE_IS_NON_SYNC = 0x00010000


def _parse_trex(data: bytes, mvex_b: int, mvex_e: int) -> dict[int, tuple]:
    """mvex → per-track (default_duration, default_size, default_flags)."""
    out = {}
    for typ, b, e, _ in iter_boxes(data, mvex_b, mvex_e):
        if typ != b"trex":
            continue
        _, p = _fullbox(data, b)
        tid, _desc, ddur, dsize, dflags = struct.unpack_from(">IIIII", data, p)
        out[int(tid)] = (int(ddur), int(dsize), int(dflags))
    return out


def _parse_fragments(
    data: bytes, moofs: list[tuple[int, int, int]], trex: dict
) -> dict[int, dict]:
    """Walk every ``moof`` and expand its ``traf``/``trun`` runs into
    per-track sample lists ``{track_id: {"offsets", "sizes",
    "dts_ticks", "is_sync"}}`` (merged across fragments in file order).
    ``moofs``: (body_start, body_end, box_start) per moof — box_start
    is the default-base-is-moof anchor, taken from :func:`iter_boxes`
    directly so a 64-bit-largesize moof header anchors correctly."""
    acc: dict[int, dict[str, list]] = {}
    next_dts: dict[int, int] = {}
    for moof_b, moof_e, moof_start in moofs:
        for typ, tb, te, _ in iter_boxes(data, moof_b, moof_e):
            if typ != b"traf":
                continue
            traf = _find_boxes(data, tb, te)
            hb, _ = traf[b"tfhd"][0]
            ver_flags = struct.unpack_from(">I", data, hb)[0]
            tf_flags = ver_flags & 0xFFFFFF
            p = hb + 4
            tid = struct.unpack_from(">I", data, p)[0]
            p += 4
            ddur, dsize, dflags = trex.get(int(tid), (0, 0, 0))
            base_offset = None
            if tf_flags & _TFHD_BASE_DATA_OFFSET:
                base_offset = struct.unpack_from(">Q", data, p)[0]
                p += 8
            if tf_flags & _TFHD_SAMPLE_DESC_IDX:
                p += 4
            if tf_flags & _TFHD_DEFAULT_DURATION:
                ddur = struct.unpack_from(">I", data, p)[0]
                p += 4
            if tf_flags & _TFHD_DEFAULT_SIZE:
                dsize = struct.unpack_from(">I", data, p)[0]
                p += 4
            if tf_flags & _TFHD_DEFAULT_FLAGS:
                dflags = struct.unpack_from(">I", data, p)[0]
                p += 4
            if base_offset is None:
                # default-base-is-moof, and the de facto reading of the
                # legacy case too: offsets are moof-relative
                base_offset = moof_start

            dts = next_dts.get(int(tid), 0)
            if b"tfdt" in traf:
                db, _ = traf[b"tfdt"][0]
                ver, p2 = _fullbox(data, db)
                dts = struct.unpack_from(
                    ">Q" if ver == 1 else ">I", data, p2
                )[0]

            slot = acc.setdefault(
                int(tid),
                {"offsets": [], "sizes": [], "dts_ticks": [], "is_sync": []},
            )
            run_offset = None   # running position for offset-less runs
            for rtyp, rb, re_, _ in iter_boxes(data, tb, te):
                if rtyp != b"trun":
                    continue
                ver_flags = struct.unpack_from(">I", data, rb)[0]
                tr_flags = ver_flags & 0xFFFFFF
                p = rb + 4
                n = struct.unpack_from(">I", data, p)[0]
                p += 4
                if tr_flags & _TRUN_DATA_OFFSET:
                    off = base_offset + struct.unpack_from(">i", data, p)[0]
                    p += 4
                elif run_offset is not None:
                    off = run_offset
                else:
                    raise ValueError(
                        "mp4 trun without data offset and no prior run"
                    )
                first_flags = None
                if tr_flags & _TRUN_FIRST_SAMPLE_FLAGS:
                    first_flags = struct.unpack_from(">I", data, p)[0]
                    p += 4
                for i in range(n):
                    dur, size, flags = ddur, dsize, dflags
                    if tr_flags & _TRUN_SAMPLE_DURATION:
                        dur = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    if tr_flags & _TRUN_SAMPLE_SIZE:
                        size = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    if tr_flags & _TRUN_SAMPLE_FLAGS:
                        flags = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    elif i == 0 and first_flags is not None:
                        flags = first_flags
                    if tr_flags & _TRUN_SAMPLE_CTS:
                        p += 4   # composition offset — dts table only
                    if size == 0:
                        raise ValueError("mp4 fragment sample of size 0")
                    slot["offsets"].append(off)
                    slot["sizes"].append(size)
                    slot["dts_ticks"].append(dts)
                    slot["is_sync"].append(not (flags & _SAMPLE_IS_NON_SYNC))
                    off += size
                    dts += dur
                run_offset = off
            next_dts[int(tid)] = dts
    return acc


def parse_mp4(data: bytes) -> dict:
    """Parse an ISO-BMFF payload into track metadata + per-sample tables.

    Returns ``{"brand": str, "tracks": [{"track_id", "handler", "codec",
    "width", "height", "timescale", "duration_sec", "n_samples",
    "offsets", "sizes", "dts_sec", "is_sync"}, ...]}``.  Handles both
    flat files (all samples described by ``stbl``) and fragmented ones
    (``moof``/``traf``/``trun`` runs appended to whatever the ``stbl``
    declares — usually nothing).  Raises ``ValueError`` for structurally
    invalid payloads."""
    top = _find_boxes(data, 0, len(data))
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("mp4 missing ftyp/moov")
    fb, fe = top[b"ftyp"][0]
    brand = data[fb : fb + 4].decode("latin-1") if fe - fb >= 4 else ""

    mb, me = top[b"moov"][0]
    moov = _find_boxes(data, mb, me)
    trex = (
        _parse_trex(data, *moov[b"mvex"][0]) if b"mvex" in moov else {}
    )
    moofs = [
        (b, e, bs)
        for typ, b, e, bs in iter_boxes(data, 0, len(data))
        if typ == b"moof"
    ]
    fragments = _parse_fragments(data, moofs, trex) if moofs else {}
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
        offsets, sizes = st["offsets"], st["sizes"]
        dts_ticks, is_sync = st["dts_ticks"], st["is_sync"]
        frag = fragments.get(int(track_id))
        if frag is not None:
            # fragment runs continue the flat table (which is empty for
            # real fMP4); fragment dts comes from tfdt when present,
            # else runs from 0 across fragments in file order
            f_dts = np.asarray(frag["dts_ticks"], dtype=np.int64)
            offsets = np.concatenate(
                [offsets, np.asarray(frag["offsets"], dtype=np.int64)]
            )
            sizes = np.concatenate(
                [sizes, np.asarray(frag["sizes"], dtype=np.int64)]
            )
            dts_ticks = np.concatenate([dts_ticks, f_dts])
            is_sync = np.concatenate(
                [is_sync, np.asarray(frag["is_sync"], dtype=bool)]
            )
        if len(sizes) and int((offsets + sizes).max()) > len(data):
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
                "n_samples": int(len(sizes)),
                "offsets": offsets,
                "sizes": sizes,
                "dts_sec": dts_ticks / timescale,
                "is_sync": is_sync,
            }
        )
    if not tracks:
        raise ValueError("mp4 moov contains no tracks")
    return {"brand": brand, "tracks": tracks}


def encode_mp4(
    samples: list[bytes],
    *,
    sync: list[int] | None = None,
    timescale: int = 600,
    delta: int = 100,
    width: int = 32,
    height: int = 24,
    codec: bytes = b"avc1",
) -> bytes:
    """Minimal flat MP4 muxer — one video track, one chunk, opaque
    sample payloads.  No ffmpeg in this environment means no real codec
    bitstreams; this exists so pipelines/benches can synthesize VALID
    containers (exercising the real parse path end-to-end) without
    native deps.  ``sync``: 1-based keyframe numbers (None → no stss →
    every sample is sync).  Round-trips exactly through
    :func:`parse_mp4` (tested)."""
    n = len(samples)
    if n == 0:
        raise ValueError("encode_mp4 needs at least one sample")

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(body), typ) + body

    def full(typ: bytes, body: bytes) -> bytes:
        return box(typ, b"\x00\x00\x00\x00" + body)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_start = len(ftyp) + 8
    sizes = [len(s) for s in samples]
    stsd = full(b"stsd", struct.pack(">I", 1) + box(codec, b"\x00" * 78))
    stts = full(b"stts", struct.pack(">III", 1, n, delta))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stco = full(b"stco", struct.pack(">II", 1, mdat_start))
    stbl_body = stsd + stts + stsc + stsz + stco
    if sync is not None:
        stbl_body += full(
            b"stss",
            struct.pack(">I", len(sync))
            + b"".join(struct.pack(">I", s) for s in sync),
        )
    minf = box(b"minf", box(b"stbl", stbl_body))
    hdlr = full(b"hdlr", struct.pack(">I4s12x", 0, b"vide") + b"video\x00")
    mdhd = full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, n * delta, 0x55C4, 0)
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, n * delta)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = full(
        b"mvhd", struct.pack(">IIII", 0, 0, timescale, n * delta) + b"\x00" * 80
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + box(b"mdat", b"".join(samples)) + moov


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
