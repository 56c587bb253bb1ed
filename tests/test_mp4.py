"""MP4 container parser tests (functions/mp4.py) + the keyframe
sampling operator — payloads built by a minimal in-test ISO-BMFF muxer
(ftyp + mdat + moov with the five stbl atoms), so the parsed sample
table can be checked byte-for-byte against what the muxer laid down."""

import struct

import numpy as np
import pytest

from knowhere_spark.functions.mp4 import (
    iter_boxes,
    parse_mp4,
    video_keyframes,
)
from knowhere_spark.operators.multimodal import (
    sample_video_keyframes,
    sniff_format,
)


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), typ) + body


def _full(typ: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(typ, struct.pack(">B3x", version) + body)


def mux_mp4(
    samples,
    *,
    sync=None,
    timescale=600,
    delta=100,
    chunks=None,
    width=64,
    height=48,
    codec=b"avc1",
):
    """Minimal valid MP4: all samples in one (or ``chunks``) mdat chunks.
    ``samples``: list of bytes payloads.  ``sync``: 1-based keyframe
    numbers (None → no stss, all sync).  Returns (payload, expected
    per-sample absolute offsets)."""
    n = len(samples)
    chunks = chunks or [n]   # samples per chunk
    assert sum(chunks) == n
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_body = b"".join(samples)
    mdat_start = len(ftyp) + 8   # absolute offset of mdat body

    sizes = [len(s) for s in samples]
    chunk_offsets = []
    pos = mdat_start
    i = 0
    for c in chunks:
        chunk_offsets.append(pos)
        pos += sum(sizes[i : i + c])
        i += c
    offsets = []
    i = 0
    for ci, c in enumerate(chunks):
        base = chunk_offsets[ci]
        within = 0
        for _ in range(c):
            offsets.append(base + within)
            within += sizes[i]
            i += 1

    stsd = _full(
        b"stsd",
        struct.pack(">I", 1)
        + _box(codec, b"\x00" * 78),   # opaque sample entry body
    )
    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    stsz = _full(
        b"stsz", struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes)
    )
    # stsc runs: collapse equal consecutive samples-per-chunk
    runs = []
    for ci, c in enumerate(chunks):
        if not runs or runs[-1][1] != c:
            runs.append((ci + 1, c))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl_body = stsd + stts + stsc + stsz + stco
    if sync is not None:
        stbl_body += _full(
            b"stss",
            struct.pack(">I", len(sync))
            + b"".join(struct.pack(">I", s) for s in sync),
        )
    stbl = _box(b"stbl", stbl_body)
    minf = _box(b"minf", stbl)
    hdlr = _full(b"hdlr", struct.pack(">I4s12x", 0, b"vide") + b"video\x00")
    mdhd = _full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, n * delta, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIII", 0, 0, 1, 0)          # cr, mod, track_id, rsvd
        + struct.pack(">I", n * delta)            # duration
        + b"\x00" * 52                            # rsvd/matrix etc
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov, offsets


def test_mp4_parse_sample_table_exact():
    samples = [bytes([i]) * (10 + 3 * i) for i in range(6)]
    data, offsets = mux_mp4(samples, sync=[1, 4], chunks=[2, 3, 1])
    assert sniff_format(data) == "mp4"
    parsed = parse_mp4(data)
    assert parsed["brand"] == "isom"
    (t,) = parsed["tracks"]
    assert t["handler"] == "vide" and t["codec"] == "avc1"
    assert t["track_id"] == 1 and t["n_samples"] == 6
    assert (t["width"], t["height"]) == (64.0, 48.0)
    np.testing.assert_array_equal(t["offsets"], offsets)
    np.testing.assert_array_equal(t["sizes"], [len(s) for s in samples])
    np.testing.assert_allclose(t["dts_sec"], np.arange(6) * 100 / 600.0)
    np.testing.assert_array_equal(
        t["is_sync"], [True, False, False, True, False, False]
    )
    # the parsed byte ranges recover the muxed sample payloads exactly
    for i in range(6):
        lo, hi = t["offsets"][i], t["offsets"][i] + t["sizes"][i]
        assert data[lo:hi] == samples[i]


def test_mp4_video_keyframes_every_n():
    samples = [bytes([i]) * 8 for i in range(10)]
    data, _ = mux_mp4(samples, sync=[1, 3, 5, 7, 9])
    ks = video_keyframes(data, every_n=2)
    assert [k["frame_idx"] for k in ks] == [0, 4, 8]
    assert all(k["payload"] == samples[k["frame_idx"]] for k in ks)
    assert all(k["codec"] == "avc1" for k in ks)


def test_mp4_no_stss_means_all_sync():
    samples = [b"xy" * 4] * 4
    data, _ = mux_mp4(samples)   # no stss
    ks = video_keyframes(data)
    assert [k["frame_idx"] for k in ks] == [0, 1, 2, 3]


def test_mp4_malformed_raises():
    samples = [b"ab" * 3] * 3
    data, _ = mux_mp4(samples, sync=[1])
    with pytest.raises(ValueError):
        parse_mp4(data[:40])             # truncated
    bad = bytearray(data)
    bad[4:8] = b"zzzz"                   # no ftyp
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def _empty_stbl() -> bytes:
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(b"avc1", b"\x00" * 78))
    stts = _full(b"stts", struct.pack(">I", 0))
    stsc = _full(b"stsc", struct.pack(">I", 0))
    stsz = _full(b"stsz", struct.pack(">II", 0, 0))
    stco = _full(b"stco", struct.pack(">I", 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def mux_fmp4(fragments, *, timescale=600, default_duration=100,
             largesize_moof=False):
    """Fragmented MP4 (DASH init + media segments in one payload):
    empty stbl, mvex/trex defaults, one moof+mdat per fragment.
    ``fragments``: list of lists of (payload, is_sync) samples.
    Returns (payload, expected absolute offsets per sample)."""
    hdlr = _full(b"hdlr", struct.pack(">I4s12x", 0, b"vide") + b"video\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", _empty_stbl()))
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", 0)
        + b"\x00" * 52 + struct.pack(">II", 32 << 16, 24 << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 80)
    # trex: track 1, desc 1, default duration/size/flags (non-sync default)
    trex = _full(
        b"trex", struct.pack(">IIIII", 1, 1, default_duration, 0, 0x00010000)
    )
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
    out = bytearray(_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso5") + moov)

    offsets = []
    base_dts = 0
    for fi, frag in enumerate(fragments):
        mfhd = _full(b"mfhd", struct.pack(">I", fi + 1))
        tfhd = _box(
            b"tfhd",
            struct.pack(">I", 0x020000)      # default-base-is-moof
            + struct.pack(">I", 1),          # track id
        )
        tfdt = _full(b"tfdt", struct.pack(">I", base_dts))
        # trun: data offset + per-sample size + per-sample flags
        tr_flags = 0x000001 | 0x000200 | 0x000400
        body = struct.pack(">I", len(frag))
        body += struct.pack(">i", 0)         # patched below
        for payload, is_sync in frag:
            flags = 0 if is_sync else 0x00010000
            body += struct.pack(">II", len(payload), flags)
        trun = _box(b"trun", struct.pack(">I", tr_flags) + body)
        traf = _box(b"traf", tfhd + tfdt + trun)
        inner = mfhd + traf
        if largesize_moof:
            # 16-byte largesize header (size=1 + 64-bit size)
            hdr = 16
            moof = bytearray(
                struct.pack(">I4sQ", 1, b"moof", hdr + len(inner)) + inner
            )
        else:
            hdr = 8
            moof = bytearray(_box(b"moof", inner))
        # data offset = moof size + mdat header, relative to moof START
        data_off = len(moof) + 8
        # trun data_offset field sits after: moof hdr + mfhd + traf hdr(8)
        # + tfhd + tfdt + trun hdr(8) + fullbox word(4) + count(4)
        pos = hdr + len(mfhd) + 8 + len(tfhd) + len(tfdt) + 8 + 4 + 4
        moof[pos : pos + 4] = struct.pack(">i", data_off)
        moof_start = len(out)
        out += moof
        mdat_body = b"".join(p for p, _ in frag)
        out += _box(b"mdat", mdat_body)
        off = moof_start + data_off
        for payload, _ in frag:
            offsets.append(off)
            off += len(payload)
        base_dts += len(frag) * default_duration
    return bytes(out), offsets


def test_fragmented_mp4_parses():
    rng = np.random.default_rng(6)
    frags = [
        [(rng.bytes(9), True), (rng.bytes(7), False), (rng.bytes(5), False)],
        [(rng.bytes(6), True), (rng.bytes(8), False)],
    ]
    data, offsets = mux_fmp4(frags)
    parsed = parse_mp4(data)
    (t,) = parsed["tracks"]
    assert t["handler"] == "vide" and t["codec"] == "avc1"
    assert t["n_samples"] == 5
    np.testing.assert_array_equal(t["offsets"], offsets)
    np.testing.assert_array_equal(
        t["is_sync"], [True, False, False, True, False]
    )
    # tfdt-pinned dts: fragment 2 continues at 3 * default_duration
    np.testing.assert_allclose(
        t["dts_sec"], np.array([0, 100, 200, 300, 400]) / 600.0
    )
    # byte ranges recover the exact muxed sample payloads
    flat = [p for frag in frags for p, _ in frag]
    for i in range(5):
        lo, hi = t["offsets"][i], t["offsets"][i] + t["sizes"][i]
        assert data[lo:hi] == flat[i]


def test_fragmented_mp4_keyframes_and_operator(spark):
    rng = np.random.default_rng(7)
    frags = [
        [(rng.bytes(10), True), (rng.bytes(4), False)],
        [(rng.bytes(6), True), (rng.bytes(4), False)],
        [(rng.bytes(5), True), (rng.bytes(4), False)],
    ]
    data, _ = mux_fmp4(frags)
    ks = video_keyframes(data, every_n=2)
    assert [k["frame_idx"] for k in ks] == [0, 4]
    assert ks[0]["payload"] == frags[0][0][0]
    assert ks[1]["payload"] == frags[2][0][0]
    media = spark.createDataFrame(
        [(9, "video", bytearray(data),
          {"width": 32, "height": 24, "n_frames": 6, "sample_rate": 0})],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    rows = sample_video_keyframes(media).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
    assert all(r.is_container == "mp4" for r in rows)


def test_mp4_iter_boxes_largesize():
    body = b"hello"
    big = struct.pack(">I4sQ", 1, b"mdat", 16 + len(body)) + body
    [(typ, b, e, bs)] = list(iter_boxes(big))
    assert bs == 0
    assert typ == b"mdat" and big[b:e] == body


def test_sample_video_keyframes_operator(spark):
    samples = [bytes([i]) * 6 for i in range(6)]
    mp4, _ = mux_mp4(samples, sync=[1, 4])
    rows = [
        (1, "video", bytearray(mp4),
         {"width": 64, "height": 48, "n_frames": 6, "sample_rate": 0}),
        (2, "video", bytearray(b"not a container"),
         {"width": 8, "height": 8, "n_frames": 4, "sample_rate": 0}),
        (3, "image", bytearray(b"skip me"),
         {"width": 8, "height": 8, "n_frames": 1, "sample_rate": 0}),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    out = sample_video_keyframes(media, every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    # real mp4 row: sync samples 0 and 3, every_n=2 keeps idx 0 only
    mp4_rows = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in mp4_rows] == [0]
    assert bytes(mp4_rows[0].frame_payload) == samples[0]
    assert mp4_rows[0].is_container == "mp4"
    assert mp4_rows[0].codec == "avc1"
    # opaque video row: synthetic indices 0, 2 with null payloads
    syn = sorted(by_id[2], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in syn] == [0, 2]
    assert all(r.frame_payload is None for r in syn)
    assert all(r.is_container == "synthetic" for r in syn)
    # image row emits nothing
    assert 3 not in by_id


def test_encode_mp4_roundtrip():
    """The library muxer (functions/mp4.encode_mp4) round-trips through
    the parser — an implementation INDEPENDENT of this file's test
    muxer, so the two validate each other."""
    from knowhere_spark.functions.mp4 import encode_mp4

    rng = np.random.default_rng(8)
    samples = [rng.bytes(5 + i) for i in range(7)]
    data = encode_mp4(samples, sync=[1, 5], width=64, height=48)
    assert sniff_format(data) == "mp4"
    (t,) = parse_mp4(data)["tracks"]
    assert t["n_samples"] == 7 and t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (64.0, 48.0)
    np.testing.assert_array_equal(t["sizes"], [len(s) for s in samples])
    np.testing.assert_array_equal(
        t["is_sync"], [True, False, False, False, True, False, False]
    )
    for i in range(7):
        lo, hi = t["offsets"][i], t["offsets"][i] + t["sizes"][i]
        assert data[lo:hi] == samples[i]
    ks = video_keyframes(data)
    assert [k["frame_idx"] for k in ks] == [0, 4]
    with pytest.raises(ValueError):
        encode_mp4([])


def test_fragmented_mp4_largesize_moof_offsets():
    """A moof with a 64-bit largesize header has a 16-byte header;
    default-base-is-moof offsets anchor at the box START (regression:
    body_start - 8 put every sample 8 bytes late)."""
    rng = np.random.default_rng(9)
    frags = [[(rng.bytes(11), True), (rng.bytes(7), False)]]
    data, offsets = mux_fmp4(frags, largesize_moof=True)
    (t,) = parse_mp4(data)["tracks"]
    np.testing.assert_array_equal(t["offsets"], offsets)
    flat = [p for frag in frags for p, _ in frag]
    for i in range(2):
        lo, hi = t["offsets"][i], t["offsets"][i] + t["sizes"][i]
        assert data[lo:hi] == flat[i]
