"""Multimodal plumbing: schema, batch shapes, determinism of the fake
codec, native frame sampling — plus REAL dependency-free codecs
(PNM/BMP/WAV, exact-recovery) and the fully-real resize round-trip.
Compressed codecs stay documented stubs; everything Spark-side is real
(mapInPandas pipeline over BINARY payload columns)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_payload,
    extract_features,
    sniff_format,
    resize_images,
    sample_frames,
    synthesize_media,
)
from knowhere_spark.sources.tables import load_table

TESTDATA = "/root/testdata/sf0.001"


def _media(spark):
    return synthesize_media(load_table(spark, TESTDATA, "documents"))


def _shape(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema_and_types(spark):
    media = _media(spark)
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)   # nullability aside
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types <= {"image", "audio", "video"}


def test_decode_deterministic():
    meta = {"width": 8, "height": 4, "n_frames": 3, "sample_rate": 16000}
    a = decode_payload(b"hello", "image", meta)
    b = decode_payload(b"hello", "image", meta)
    assert a.shape == (4, 8, 3)
    np.testing.assert_array_equal(a, b)
    c = decode_payload(b"other", "image", meta)
    assert not np.array_equal(a, c)


def test_extract_features_shapes(spark):
    media = _media(spark)
    feats = extract_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_features(media, 16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_resize_updates_meta(spark):
    media = _media(spark)
    resized = resize_images(media, 8, 6)
    assert _shape(resized.schema) == _shape(MEDIA_SCHEMA)
    imgs = resized.filter(F.col("media_type") == "image")
    bad = imgs.filter(
        (F.col("meta.width") != 8) | (F.col("meta.height") != 6)
    ).count()
    assert bad == 0
    # non-image rows untouched
    n_other = media.filter(F.col("media_type") != "image").count()
    assert resized.filter(F.col("media_type") != "image").count() == n_other


def test_sample_frames_native(spark):
    media = _media(spark)
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    vids = {r["media_id"]: r["meta"]["n_frames"]
            for r in media.filter(F.col("media_type") == "video").collect()}
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(got) == set(vids)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, vids[mid], 2))


def _make_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _make_bmp(px: np.ndarray) -> bytes:
    import struct

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):            # bottom-up
        row = px[y, :, ::-1].astype(np.uint8).tobytes()   # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + info + rows


def _make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_real_formats_exact():
    """PNM/BMP/WAV payloads decode for REAL (no fake): exact pixel and
    near-exact sample recovery, strict magic sniffing."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3))
    ppm = decode_payload(_make_ppm(px), "image", {})
    np.testing.assert_allclose(ppm, px / 255.0)
    bmp = decode_payload(_make_bmp(px), "image", {})
    np.testing.assert_allclose(bmp, px / 255.0)
    s = rng.uniform(-0.9, 0.9, 64)
    wav = decode_payload(_make_wav(s), "audio", {})
    assert wav.shape == (64,)
    # truncation at encode (x*32767 → int16) + the /32768 decode scale
    # bound the roundtrip error by ~2/32768
    np.testing.assert_allclose(wav, s, atol=2.0 / 32767, rtol=0)
    # 16-bit PNM and grayscale P5 also decode
    px16 = rng.integers(0, 65536, (3, 4, 3))
    p6_16 = b"P6\n4 3\n65535\n" + px16.astype(">u2").tobytes()
    np.testing.assert_allclose(decode_payload(p6_16, "image", {}), px16 / 65535.0)
    gray = rng.integers(0, 256, (4, 6, 1))
    p5 = b"P5\n6 4\n255\n" + gray.astype(np.uint8).tobytes()
    np.testing.assert_allclose(decode_payload(p5, "image", {}), gray[:, :, 0] / 255.0)
    # a text payload that merely STARTS with a magic-ish prefix stays on
    # the deterministic-fake path (strict sniff)
    fake = decode_payload(b"BMW sales rose in P6 markets", "image",
                          {"height": 4, "width": 4})
    assert fake.shape == (4, 4, 3)


def test_extract_features_real_payloads(spark):
    """The mapInPandas feature stage runs unchanged over REAL payloads —
    same schema/batch plumbing, real decode underneath."""
    rng = np.random.default_rng(4)
    rows = [
        (1, "image", bytearray(_make_ppm(rng.integers(0, 256, (6, 6, 3)))),
         {"width": 6, "height": 6, "n_frames": 1, "sample_rate": 0}),
        (2, "audio", bytearray(_make_wav(rng.uniform(-1, 1, 128))),
         {"width": 0, "height": 0, "n_frames": 1, "sample_rate": 8000}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in extract_features(media, 8).collect()}
    assert set(feats) == {1, 2}
    assert all(len(v) == 8 and np.isfinite(v).all() for v in feats.values())


def test_resize_roundtrips_real_payload(spark):
    """decode → resample → re-encode is fully real now: the resized
    payload decodes back to exactly the nearest-neighbor resample of the
    input pixels (8-bit quantized)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (10, 12, 3))
    rows = [(1, "image", bytearray(_make_ppm(px)),
             {"width": 12, "height": 10, "n_frames": 1, "sample_rate": 0})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, 6, 4).collect()[0]
    assert out["meta"]["width"] == 6 and out["meta"]["height"] == 4
    got = decode_payload(bytes(out["payload"]), "image", {})
    yi = np.linspace(0, 9, 4).astype(int)
    xi = np.linspace(0, 11, 6).astype(int)
    want = (px / 255.0)[yi][:, xi]
    np.testing.assert_allclose(got, np.rint(want * 255) / 255.0, atol=1e-9)


def test_image_phash_neardup(spark):
    """pHash near-dup: mild pixel noise keeps a pair within small Hamming
    distance; unrelated images are far; the banded pair join is EXACT
    (matches brute-force over the hashes)."""
    rng = np.random.default_rng(6)
    base_img = rng.integers(40, 216, (24, 24, 3))
    noisy = np.clip(base_img + rng.integers(-4, 5, base_img.shape), 0, 255)
    other = rng.integers(0, 256, (24, 24, 3))
    rows = []
    for mid, px in [(1, base_img), (2, noisy), (3, other)]:
        rows.append((mid, "image", bytearray(_make_ppm(px)),
                     {"width": 24, "height": 24, "n_frames": 1, "sample_rate": 0}))
    from knowhere_spark.operators.multimodal import image_phash, phash_neardup_pairs

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["phash"] for r in image_phash(media).collect()}
    assert set(hashes) == {1, 2, 3}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(hashes[1], hashes[2]) <= 6          # noisy copy stays close
    assert ham(hashes[1], hashes[3]) > 16          # unrelated is far
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in phash_neardup_pairs(media, max_hamming=6).collect()}
    # banded join == brute force over the hash table
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = ham(hashes[a], hashes[b])
            if h <= 6:
                want[(a, b)] = h
    assert pairs == want and (1, 2) in pairs
    # r10 stop-hash cap (video/audio discipline): a flood of identical
    # images past the cap creates no pairs on its own; the real near-dup
    # pair survives
    flood = [
        (10 + i, "image", bytearray(_make_ppm(other)),
         {"width": 24, "height": 24, "n_frames": 1, "sample_rate": 0})
        for i in range(6)
    ]
    media2 = spark.createDataFrame(rows + flood, MEDIA_SCHEMA)
    capped = {
        (r["id_a"], r["id_b"])
        for r in phash_neardup_pairs(
            media2, max_hamming=6, max_hash_freq=3
        ).collect()
    }
    assert capped == set(want)             # flood dropped before banding
    uncapped = phash_neardup_pairs(
        media2, max_hamming=6, max_hash_freq=None
    ).count()
    assert uncapped == len(want) + 7 * 6 // 2  # flood + row 3 all pair up


def test_hamming64_pairs_exact_banding(spark):
    """Pigeonhole banding at several max_hamming values reproduces the
    brute-force pair set exactly — including the uneven-band widths when
    (max_hamming + 1) does not divide 64."""
    from knowhere_spark.operators.dedup import hamming64_pairs

    rng = np.random.default_rng(7)
    sigs = [int(v) for v in
            rng.integers(0, 2**64, 30, dtype=np.uint64).astype(np.int64)]
    # plant close pairs: flip k bits of sig 0
    for k, mid in [(1, 100), (4, 101), (7, 102)]:
        flipped = np.uint64(sigs[0] & 0xFFFFFFFFFFFFFFFF)
        for b in rng.choice(64, k, replace=False):
            flipped ^= np.uint64(1) << np.uint64(b)
        sigs.append(int(flipped.astype(np.int64)))
    ids = list(range(30)) + [100, 101, 102]
    df = spark.createDataFrame(list(zip(ids, sigs)), "mid long, sig long")

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    table = dict(zip(ids, sigs))
    for mh in (1, 4, 7):   # 2, 5 and 8 bands — 5 and 8 split 64 unevenly
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in hamming64_pairs(df, mh, id_col="mid", sig_col="sig").collect()}
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                x, y = (a, b) if a < b else (b, a)
                h = ham(table[x], table[y])
                if h <= mh:
                    want[(x, y)] = h
        assert got == want, f"max_hamming={mh}"


def test_audio_spectral_features_real_tone(spark):
    """A pure tone's energy lands in the right frequency band; white
    noise spreads across bands — real FFT over real WAV decode."""
    from knowhere_spark.operators.multimodal import audio_spectral_features

    rate = 8000
    t = np.arange(4096) / rate
    tone = 0.8 * np.sin(2 * np.pi * 3000.0 * t)     # 3 kHz → band 12/16 @ 4 kHz nyquist
    rng = np.random.default_rng(8)
    noise = rng.uniform(-0.5, 0.5, 4096)
    rows = [
        (1, "audio", bytearray(_make_wav(tone, rate)),
         {"width": 0, "height": 0, "n_frames": 1, "sample_rate": rate}),
        (2, "audio", bytearray(_make_wav(noise, rate)),
         {"width": 0, "height": 0, "n_frames": 1, "sample_rate": rate}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: np.array(r["features"])
             for r in audio_spectral_features(media).collect()}
    tone_f, noise_f = feats[1], feats[2]
    # the 3 kHz bin (3000/4000 * 128 = 96 of 129 rfft bins) maps to band
    # floor(96*16/129) = 11; the tone straddles the 11|12 boundary, so
    # those two bands hold essentially all the energy
    assert int(tone_f.argmax()) == 96 * 16 // 129 == 11
    rest = np.delete(tone_f, [11, 12])
    assert min(tone_f[11], tone_f[12]) > 3 * rest.max()
    # noise: no single band dominates like the tone's does
    assert noise_f.max() < 2 * noise_f.min()


def test_decode_sniffed_but_unparseable_falls_back(spark):
    """A corpus payload that merely LOOKS like a real format must not
    kill the stage: 'P6 ' text, truncated BMP and truncated WAV all fall
    back to the deterministic fake (review r4 regression)."""
    import struct

    meta = {"height": 4, "width": 4, "n_frames": 1, "sample_rate": 100}
    # a valid 24bpp BMP header claiming 100x100 pixels with NO pixel data
    trunc_bmp = (
        struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 100, 100, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    for payload in (
        b"P6 to the moon, said the analyst",
        trunc_bmp,
        b"RIFF\x00\x00\x00\x00WAVEjunk",
    ):
        arr = decode_payload(payload, "image", meta)
        assert arr.shape == (4, 4, 3)
    # and the full Spark stage survives such a payload
    rows = [(9, "image", bytearray(b"P6 not actually a pixmap"),
             {"width": 4, "height": 4, "n_frames": 1, "sample_rate": 0})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert len(extract_features(media, 4).collect()) == 1


def test_hamming64_pairs_max_hamming_zero(spark):
    """max_hamming=0 (exact-equal signatures) works: the single 64-bit
    band carries the signature unmasked (review r4 regression — the
    (1<<64)-1 mask overflowed a Spark long literal)."""
    from knowhere_spark.operators.dedup import hamming64_pairs

    df = spark.createDataFrame(
        [(1, -5), (2, -5), (3, 7), (4, 7), (5, 9)], "mid long, sig long"
    )
    got = {(r["id_a"], r["id_b"]) for r in
           hamming64_pairs(df, 0, id_col="mid", sig_col="sig").collect()}
    assert got == {(1, 2), (3, 4)}


# --- r5 (VERDICT r4 #6): pluggable decoder injection -------------------------

def _fake_jpeg_codec(payload: bytes, meta: dict) -> np.ndarray:
    # stands in for PIL: a production environment would decode for real
    return np.full((3, 3, 3), 0.25)


def _marker_pnm_codec(payload: bytes, meta: dict) -> np.ndarray:
    return np.full((2, 2), 7.0)


def _broken_codec(payload: bytes, meta: dict) -> np.ndarray:
    raise ValueError("corrupt")


def test_injected_decoder_wins_over_stub():
    """A caller-supplied codec decodes where the built-in would raise
    NotImplementedError — the production PIL/ffmpeg hook.  r9:
    progressive (SOF2) now decodes for real too, so the recognized-
    but-undecodable case is an ARITHMETIC-coded frame (SOF9); a
    sniffed-but-corrupt jpeg falls to the deterministic fake."""
    import struct

    from knowhere_spark.operators.multimodal import sniff_format

    sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    arith = (
        b"\xff\xd8"
        + b"\xff\xc9" + struct.pack(">H", len(sof9) + 2) + sof9
    )
    assert sniff_format(arith) == "jpeg"
    try:
        decode_payload(arith, "image", {"height": 2, "width": 2})
        raise AssertionError("expected NotImplementedError without injection")
    except NotImplementedError:
        pass
    out = decode_payload(
        arith, "image", {"height": 2, "width": 2},
        {"jpeg": _fake_jpeg_codec},
    )
    np.testing.assert_array_equal(out, np.full((3, 3, 3), 0.25))
    # corrupt-after-sniff (magic + zeros) is opaque data, not a stub:
    # deterministic fake, never a dead stage
    corrupt = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    fake = decode_payload(corrupt, "image", {"height": 2, "width": 2})
    assert fake.shape == (2, 2, 3)


def test_injected_decoder_wins_over_builtin_and_falls_back_on_corrupt():
    rng = np.random.default_rng(5)
    ppm = _make_ppm(rng.integers(0, 256, (4, 4, 3)))
    # injected pnm codec overrides the REAL built-in decode
    out = decode_payload(ppm, "image", {}, {"pnm": _marker_pnm_codec})
    np.testing.assert_array_equal(out, np.full((2, 2), 7.0))
    # an injected codec that can't parse follows the built-in discipline:
    # opaque payload -> deterministic fake, never a dead stage
    fake = decode_payload(
        ppm, "image", {"height": 3, "width": 5}, {"pnm": _broken_codec}
    )
    assert fake.shape == (3, 5, 3)
    fake2 = decode_payload(
        ppm, "image", {"height": 3, "width": 5}, {"pnm": _broken_codec}
    )
    np.testing.assert_array_equal(fake, fake2)
    # formats WITHOUT an injected entry keep stub behavior unchanged
    wav = _make_wav(np.zeros(16))
    got = decode_payload(wav, "audio", {}, {"pnm": _marker_pnm_codec})
    assert got.shape == (16,)


def test_injected_decoder_through_distributed_kernel(spark):
    """The hook must survive pickling into the Arrow kernel: jpeg rows
    featurize through an injected codec end-to-end.  (Defined as a
    closure here so cloudpickle ships it by value — pytest modules
    aren't importable on executors; production codecs live in an
    installed package and pickle by reference.)"""

    def jpeg_codec(payload: bytes, meta: dict) -> np.ndarray:
        return np.full((3, 3, 3), 0.25)

    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    media = spark.createDataFrame(
        [
            (
                1,
                "image",
                bytearray(jpeg),
                {"width": 3, "height": 3, "n_frames": 1, "sample_rate": 16000},
            )
        ],
        MEDIA_SCHEMA,
    )
    feats = extract_features(
        media, feature_dim=4, decoders={"jpeg": jpeg_codec}
    ).collect()
    assert len(feats) == 1
    # 27 decoded values pad to 28 → the last 7-chunk averages in one zero
    np.testing.assert_allclose(
        list(feats[0].features), [0.25, 0.25, 0.25, 0.25 * 6 / 7], rtol=1e-6
    )


def test_mp4_sniff_requires_plausible_box_size():
    from knowhere_spark.operators.multimodal import sniff_format

    real = (24).to_bytes(4, "big") + b"ftypisom" + b"\x00" * 16
    assert sniff_format(real) == "mp4"
    # text with "ftyp" at offset 4 must stay opaque
    assert sniff_format(b"say ftyp loudly " * 2) is None
    fake = decode_payload(
        b"say ftyp loudly " * 2, "video",
        {"n_frames": 2, "height": 2, "width": 2},
    )
    assert fake.shape == (2, 2, 2)
    # a REAL mp4 without an injected codec is the honest stub
    try:
        decode_payload(real, "video", {"n_frames": 2, "height": 2, "width": 2})
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


# --- r7: pure-stdlib PNG decoder (zlib inflate + numpy defiltering) -------

def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + typ + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _make_png(px, filters=0, *, depth=8, color_type=None, interlace=0,
              palette=None):
    """Minimal PNG encoder for tests: forward-filters each scanline with
    the requested filter type(s), deflates, and frames the chunks — the
    inverse of the decoder under test, written independently from the
    spec's ENCODE direction."""
    import struct
    import zlib

    from knowhere_spark.operators.multimodal import _paeth_predict

    px = np.asarray(px)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = max(1, ch * depth // 8)
    if isinstance(filters, int):
        filters = [filters]
    row_no = [0]   # global row counter: filter types cycle across passes

    def _enc_rows(rows) -> bytes:
        out = bytearray()
        prev = np.zeros(rows.shape[1], dtype=np.int32)
        for y in range(rows.shape[0]):
            ft = filters[row_no[0] % len(filters)]
            row_no[0] += 1
            cur = rows[y].astype(np.int32)
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            upleft = np.zeros_like(prev)
            upleft[bpp:] = prev[:-bpp]
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = cur - left
            elif ft == 2:
                enc = cur - prev
            elif ft == 3:
                enc = cur - (left + prev) // 2
            else:
                enc = cur - _paeth_predict(left, prev, upleft)
            out += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()
            prev = cur
        return bytes(out)

    def _rows_of(p):
        ph = p.shape[0]
        if depth == 16:
            return np.ascontiguousarray(
                p.astype(">u2").reshape(ph, -1)
            ).view(np.uint8)
        if depth < 8:   # MSB-first d-bit packing, rows zero-padded to bytes
            b = (
                p.astype(np.uint8).reshape(ph, -1)[..., None]
                >> np.arange(depth - 1, -1, -1)
            ) & 1
            return np.packbits(b.reshape(ph, -1), axis=1)
        return np.ascontiguousarray(p.astype(np.uint8).reshape(ph, -1))

    body = bytearray()
    if interlace == 1:
        # Adam7: each pass is its own filtered sub-image (spec ENCODE
        # direction), empty passes emit nothing
        passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        for x0, y0, dx, dy in passes:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += _enc_rows(_rows_of(sub))
    else:
        body += _enc_rows(_rows_of(px))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    data = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        data += _png_chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    data += _png_chunk(b"IDAT", zlib.compress(bytes(body)))
    data += _png_chunk(b"IEND", b"")
    return data


def test_png_decode_all_filter_types():
    """Exact pixel recovery through every scanline filter (None/Sub/Up/
    Average/Paeth) and through a mixed-filter image."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (7, 5, 3))
    for ft in range(5):
        got = decode_payload(_make_png(px, ft), "image", {})
        np.testing.assert_allclose(got, px / 255.0, err_msg=f"filter {ft}")
    mixed = [0, 1, 2, 3, 4, 2, 4]
    np.testing.assert_allclose(
        decode_payload(_make_png(px, mixed), "image", {}), px / 255.0
    )


def test_png_decode_color_types_and_depths():
    rng = np.random.default_rng(12)
    # grayscale, gray+alpha, RGBA — 8-bit, Paeth throughout
    for shape in [(6, 4), (6, 4, 2), (6, 4, 4)]:
        px = rng.integers(0, 256, shape)
        got = decode_payload(_make_png(px, 4), "image", {})
        np.testing.assert_allclose(got, px / 255.0)
        assert got.shape == ((6, 4) if len(shape) == 2 else shape)
    # 16-bit RGB (big-endian samples), Average filter
    px16 = rng.integers(0, 65536, (5, 3, 3))
    got16 = decode_payload(_make_png(px16, 3, depth=16), "image", {})
    np.testing.assert_allclose(got16, px16 / 65535.0)
    # 8-bit palette
    palette = rng.integers(0, 256, (7, 3))
    idx = rng.integers(0, 7, (4, 6))
    got_p = decode_payload(
        _make_png(idx, 1, color_type=3, palette=palette), "image", {}
    )
    np.testing.assert_allclose(got_p, palette[idx] / 255.0)


def test_png_adam7_exact_recovery():
    """Adam7 interlaced PNGs decode exactly (r9 — previously a
    recognized-but-undecodable stub): odd dims force partial passes,
    mixed per-row filters exercise per-pass filter state, and the
    interlaced decode must equal the non-interlaced decode of the same
    pixels."""
    rng = np.random.default_rng(21)
    mixed = [0, 1, 2, 3, 4]
    for shape in [(7, 5, 3), (6, 4), (9, 9, 4), (1, 1, 3), (3, 10, 2)]:
        px = rng.integers(0, 256, shape)
        got = decode_payload(_make_png(px, mixed, interlace=1), "image", {})
        np.testing.assert_allclose(got, px / 255.0, err_msg=f"{shape}")
        plain = decode_payload(_make_png(px, mixed), "image", {})
        np.testing.assert_array_equal(got, plain)
    # 16-bit RGB and 8-bit palette through Adam7
    px16 = rng.integers(0, 65536, (5, 7, 3))
    got16 = decode_payload(_make_png(px16, 4, depth=16, interlace=1), "image", {})
    np.testing.assert_allclose(got16, px16 / 65535.0)
    palette = rng.integers(0, 256, (7, 3))
    idx = rng.integers(0, 7, (6, 5))
    got_p = decode_payload(
        _make_png(idx, 2, color_type=3, palette=palette, interlace=1),
        "image", {},
    )
    np.testing.assert_allclose(got_p, palette[idx] / 255.0)


def test_png_subbyte_depths_decode():
    """1/2/4-bit grayscale and palette PNGs decode exactly (r9 — the
    last PNG honest stub removed): byte-level filtering with bpp=1,
    MSB-first bit unpacking, row padding ignored, Adam7 included."""
    rng = np.random.default_rng(22)
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        px = rng.integers(0, maxv + 1, (7, 11))
        got = decode_payload(_make_png(px, [0, 1, 2, 3, 4], depth=depth),
                             "image", {})
        np.testing.assert_allclose(got, px / maxv, err_msg=f"gray d{depth}")
        inter = decode_payload(
            _make_png(px, [0, 1, 2, 3, 4], depth=depth, interlace=1),
            "image", {},
        )
        np.testing.assert_array_equal(inter, got)
    palette = rng.integers(0, 256, (16, 3))
    idx = rng.integers(0, 16, (6, 9))
    got_p = decode_payload(
        _make_png(idx, 4, color_type=3, palette=palette, depth=4),
        "image", {},
    )
    np.testing.assert_allclose(got_p, palette[idx] / 255.0)


def test_png_invalid_depth_combo_is_valueerror():
    """Spec-INVALID combos (4-bit RGB) are corrupt data, not a stub:
    ValueError → the kernel's opaque-payload fake, never a dead stage."""
    import struct
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)   # 4-bit RGB
    payload = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 12))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_payload(payload, "image", {"height": 3, "width": 4})
    assert out.shape == (3, 4, 3)   # deterministic fake


def test_png_corrupt_falls_back_to_fake():
    """A payload with the PNG magic but garbage chunks is OPAQUE (corrupt
    data must not kill a 100 TB mapInPandas stage): deterministic fake."""
    bad = b"\x89PNG\r\n\x1a\n" + b"garbage-not-chunks"
    out = decode_payload(bad, "image", {"height": 3, "width": 4})
    assert out.shape == (3, 4, 3)
    np.testing.assert_array_equal(
        out, decode_payload(bad, "image", {"height": 3, "width": 4})
    )


def test_image_phash_over_png_corpus(spark):
    """pHash near-dup over REAL PNG payloads end-to-end: the decoder
    feeds the same pipeline the PNM corpus exercised."""
    from knowhere_spark.operators.multimodal import image_phash, phash_neardup_pairs

    rng = np.random.default_rng(14)
    base_img = rng.integers(40, 216, (24, 24, 3))
    noisy = np.clip(base_img + rng.integers(-4, 5, base_img.shape), 0, 255)
    other = rng.integers(0, 256, (24, 24, 3))
    rows = [
        (mid, "image", bytearray(_make_png(px, ft)),
         {"width": 24, "height": 24, "n_frames": 1, "sample_rate": 0})
        for (mid, px), ft in zip([(1, base_img), (2, noisy), (3, other)],
                                 [1, 3, 4])
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["phash"] for r in image_phash(media).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(hashes[1], hashes[2]) <= 6
    assert ham(hashes[1], hashes[3]) > 16
    pairs = {(r["id_a"], r["id_b"]) for r in
             phash_neardup_pairs(media, max_hamming=6).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_decode_real_encoder_files_cross_format():
    """Regression against REAL encoder output across every format the
    built-in decoders claim: the running interpreter's stdlib ships a
    cross-format image corpus (test/imghdrdata/python.*) plus idlelib
    PNG icons.  A meta of 5x5 distinguishes real decode (true 16x16
    shape) from the deterministic fake (meta-shaped)."""
    import glob
    import sysconfig

    stdlib = sysconfig.get_path("stdlib")
    corpus = sorted(glob.glob(stdlib + "/test/imghdrdata/python*"))
    if not corpus:
        pytest.skip("no imghdrdata corpus in this interpreter")
    meta = {"width": 5, "height": 5, "n_frames": 1, "sample_rate": 100}
    real_formats = set()
    for path in corpus:
        data = open(path, "rb").read()
        fmt = sniff_format(data)
        arr = decode_payload(data, "image", meta)
        if fmt in ("jpeg", "png", "gif", "pnm", "bmp"):
            assert arr.shape[:2] == (16, 16), (path, arr.shape)
            assert 0.0 <= arr.min() and arr.max() <= 1.0
            real_formats.add(fmt)
        else:
            # webp/tiff/exr/... stay opaque → deterministic fake
            assert arr.shape == (5, 5, 3), (path, fmt, arr.shape)
    # every claimed format must actually appear in the corpus
    assert real_formats == {"jpeg", "png", "gif", "pnm", "bmp"}


def test_decode_real_wav_all_pcm_widths():
    """Real-encoder WAV regression: the stdlib's audiodata fixtures are
    the same pluck recording at 8/16/24/32-bit PCM — every width must
    decode and agree with the 16-bit reference within quantization."""
    import glob
    import sysconfig

    from knowhere_spark.operators.multimodal import _decode_wav

    stdlib = sysconfig.get_path("stdlib")
    paths = {
        w: stdlib + f"/test/audiodata/pluck-pcm{w}.wav" for w in (8, 16, 24, 32)
    }
    if not all(glob.glob(p) for p in paths.values()):
        pytest.skip("no stdlib audiodata fixtures")
    ref = _decode_wav(open(paths[16], "rb").read())
    for w, tol in ((8, 0.02), (24, 1e-4), (32, 1e-4)):
        x = _decode_wav(open(paths[w], "rb").read())
        assert len(x) == len(ref)
        assert float(np.abs(x - ref).max()) < tol


def test_injected_jpeg_codec_wins_over_real_builtin():
    """Injection parity for the format that actually HAS a real
    built-in: a valid baseline JPEG (built-in decodes it fine) must
    still route to an injected jpeg codec — the production
    libjpeg-turbo hook replaces, not supplements, the pure-Python
    path.  A RAISING injected codec falls back to the built-in
    discipline (opaque → deterministic fake), never a dead stage."""
    import sysconfig

    real = open(
        sysconfig.get_path("stdlib") + "/test/imghdrdata/python.jpg", "rb"
    ).read()
    builtin_out = decode_payload(real, "image", {})
    assert builtin_out.ndim in (2, 3)        # the built-in really decodes
    out = decode_payload(real, "image", {}, {"jpeg": _fake_jpeg_codec})
    np.testing.assert_array_equal(out, np.full((3, 3, 3), 0.25))
    fake = decode_payload(
        real, "image", {"height": 4, "width": 6}, {"jpeg": _broken_codec}
    )
    assert fake.shape == (4, 6, 3)


# --- r9: 16-bit / sub-byte-palette / RLE BMP variants ----------------------

def _bmp_headers(w, h, bpp, comp, body, palette=None, masks=None):
    import struct

    pal = b""
    if palette is not None:
        pal = b"".join(
            bytes([b, g, r, 0]) for r, g, b in np.asarray(palette, np.uint8)
        )
    extra = b""
    if masks is not None:
        extra = struct.pack("<III", *masks)
    off = 54 + len(extra) + len(pal)
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    ncol = len(palette) if palette is not None else 0
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(body), 0, 0, ncol, 0
    )
    return header + info + extra + pal + body


def test_bmp_16bit_rgb555_and_bitfields565():
    rng = np.random.default_rng(31)
    h, w = 5, 3
    r5 = rng.integers(0, 32, (h, w))
    g5 = rng.integers(0, 32, (h, w))
    b5 = rng.integers(0, 32, (h, w))
    words = (r5 << 10) | (g5 << 5) | b5
    stride = (w * 2 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):                       # bottom-up
        row = words[y].astype("<u2").tobytes()
        body += row + b"\x00" * (stride - len(row))
    got = decode_payload(_bmp_headers(w, h, 16, 0, body), "image", {})
    exp = np.stack([r5 / 31.0, g5 / 31.0, b5 / 31.0], axis=-1)
    np.testing.assert_allclose(got, exp)
    # 565 via BI_BITFIELDS masks
    g6 = rng.integers(0, 64, (h, w))
    words = (r5 << 11) | (g6 << 5) | b5
    body = b""
    for y in range(h - 1, -1, -1):
        row = words[y].astype("<u2").tobytes()
        body += row + b"\x00" * (stride - len(row))
    got = decode_payload(
        _bmp_headers(w, h, 16, 3, body, masks=(0xF800, 0x07E0, 0x001F)),
        "image", {},
    )
    exp = np.stack([r5 / 31.0, g6 / 63.0, b5 / 31.0], axis=-1)
    np.testing.assert_allclose(got, exp)


def test_bmp_subbyte_palette():
    rng = np.random.default_rng(32)
    palette = rng.integers(0, 256, (16, 3))
    h, w = 4, 7
    idx = rng.integers(0, 16, (h, w))
    # 4-bit: two indices per byte MSB-first, DWORD-padded rows
    body = b""
    for y in range(h - 1, -1, -1):
        nib = idx[y]
        if w % 2:
            nib = np.append(nib, 0)
        row = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8).tobytes()
        body += row + b"\x00" * ((-len(row)) % 4)
    got = decode_payload(
        _bmp_headers(w, h, 4, 0, body, palette=palette), "image", {}
    )
    np.testing.assert_allclose(got, palette[idx] / 255.0)
    # 1-bit
    pal2 = np.array([[0, 0, 0], [255, 255, 255]])
    bits = rng.integers(0, 2, (h, w))
    body = b""
    for y in range(h - 1, -1, -1):
        row = np.packbits(bits[y]).tobytes()
        body += row + b"\x00" * ((-len(row)) % 4)
    got1 = decode_payload(
        _bmp_headers(w, h, 1, 0, body, palette=pal2), "image", {}
    )
    np.testing.assert_allclose(got1, pal2[bits] / 255.0)


def test_bmp_rle8_and_rle4():
    palette = np.arange(48).reshape(16, 3) * 5
    # RLE8: bottom row written first (BMP row order); runs + absolute +
    # EOL + delta (skipped pixels stay index 0) + EOS
    body = bytes(
        [3, 7]                        # row y=2 (bottom): 7 7 7
        + [0, 3, 1, 2, 3, 0]          # absolute: 1 2 3 (pad to WORD)
        + [0, 0]                      # EOL
        + [0, 2, 2, 0]                # delta: skip 2 pixels on row y=1
        + [4, 9]                      # then 9 9 9 9
        + [0, 0]                      # EOL
        + [6, 5]                      # row y=0 (top): 5 x6
        + [0, 1]                      # EOS
    )
    exp_idx = np.array(
        [
            [5, 5, 5, 5, 5, 5],        # top row
            [0, 0, 9, 9, 9, 9],        # delta left 2 undefined (0)
            [7, 7, 7, 1, 2, 3],
        ]
    )
    got = decode_payload(
        _bmp_headers(6, 3, 8, 1, body, palette=palette), "image", {}
    )
    np.testing.assert_allclose(got, palette[exp_idx] / 255.0)
    # RLE4: encoded runs alternate the two nibbles; absolute packs pairs
    body4 = bytes(
        [5, 0x12]                     # 1 2 1 2 1
        + [0, 3, 0x34, 0x50]          # absolute 3 4 5 (2 bytes, already
                                      #   WORD-aligned: no pad)
        + [0, 0]                      # EOL
        + [8, 0x9A]                   # 9 A 9 A 9 A 9 A
        + [0, 1]                      # EOS
    )
    exp4 = np.array([[9, 10, 9, 10, 9, 10, 9, 10], [1, 2, 1, 2, 1, 3, 4, 5]])
    got4 = decode_payload(
        _bmp_headers(8, 2, 4, 2, body4, palette=palette), "image", {}
    )
    np.testing.assert_allclose(got4, palette[exp4] / 255.0)


def test_wav_ieee_float_decodes():
    """fmt-tag-3 (IEEE float) WAV — the ML-audio-dataset default the
    stdlib wave module rejects — decodes via the manual RIFF walk,
    32- and 64-bit, stereo mono-averaged."""
    import struct

    rng = np.random.default_rng(33)
    x = rng.uniform(-1, 1, 64)

    def float_wav(samples, nch, bits):
        fmt_body = struct.pack(
            "<HHIIHH", 3, nch, 8000, 8000 * nch * bits // 8,
            nch * bits // 8, bits,
        )
        raw = samples.astype("<f4" if bits == 32 else "<f8").tobytes()
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    got = decode_payload(float_wav(x, 1, 32), "audio", {})
    np.testing.assert_allclose(got, x.astype(np.float32), rtol=1e-6)
    got64 = decode_payload(float_wav(x, 1, 64), "audio", {})
    np.testing.assert_allclose(got64, x)
    stereo = np.empty(128)
    stereo[0::2] = x
    stereo[1::2] = -x
    gots = decode_payload(float_wav(stereo, 2, 64), "audio", {})
    np.testing.assert_allclose(gots, np.zeros(64), atol=1e-12)


def test_png_trns_palette_alpha():
    """tRNS on a palette PNG (the web transparent-PNG shape) decodes to
    RGBA; entries beyond the tRNS table default opaque (spec
    11.3.2.1); no tRNS keeps the plain RGB output."""
    rng = np.random.default_rng(34)
    palette = rng.integers(0, 256, (4, 3))
    idx = rng.integers(0, 4, (5, 6))
    import struct
    import zlib

    base = _make_png(idx, 1, color_type=3, palette=palette)
    assert decode_payload(base, "image", {}).shape == (5, 6, 3)
    # splice a tRNS chunk (alphas for entries 0 and 1 only) before IDAT
    trns = _png_chunk(b"tRNS", bytes([0, 128]))
    at = base.find(b"IDAT") - 4
    with_trns = base[:at] + trns + base[at:]
    out = decode_payload(with_trns, "image", {})
    assert out.shape == (5, 6, 4)
    np.testing.assert_allclose(out[..., :3], palette[idx] / 255.0)
    exp_alpha = np.array([0, 128, 255, 255])[idx] / 255.0
    np.testing.assert_allclose(out[..., 3], exp_alpha)


def test_orient_image_all_tags():
    """EXIF orientations 1-8 on an asymmetric array: exact expected
    grids for the rotation cases, involution/inverse properties for
    all."""
    from knowhere_spark.operators.multimodal import orient_image

    a = np.arange(6).reshape(2, 3)            # [[0,1,2],[3,4,5]]
    np.testing.assert_array_equal(orient_image(a, 1), a)
    np.testing.assert_array_equal(orient_image(a, 2), [[2, 1, 0], [5, 4, 3]])
    np.testing.assert_array_equal(orient_image(a, 3), [[5, 4, 3], [2, 1, 0]])
    np.testing.assert_array_equal(orient_image(a, 4), [[3, 4, 5], [0, 1, 2]])
    np.testing.assert_array_equal(orient_image(a, 5), [[0, 3], [1, 4], [2, 5]])
    # 6 = rotate 90 CW, 8 = rotate 90 CCW
    np.testing.assert_array_equal(orient_image(a, 6), np.rot90(a, -1))
    np.testing.assert_array_equal(orient_image(a, 8), np.rot90(a, 1))
    # 7 = transverse: transpose of the 180-rotation
    np.testing.assert_array_equal(
        orient_image(a, 7), np.swapaxes(a[::-1, ::-1], 0, 1)
    )
    # inverse pairs: 6 undoes 8; 2/3/4/5/7 are involutions; None/0 no-op
    for tag in (2, 3, 4, 5, 7):
        np.testing.assert_array_equal(orient_image(orient_image(a, tag), tag), a)
    np.testing.assert_array_equal(orient_image(orient_image(a, 6), 8), a)
    np.testing.assert_array_equal(orient_image(a, None), a)
    # channel axis preserved
    c = np.arange(24).reshape(2, 3, 4)
    assert orient_image(c, 6).shape == (3, 2, 4)


def test_wav_g711_ulaw_alaw_decode():
    """fmt-tag 7 (µ-law) / 6 (A-law) WAV — telephony-corpus codecs the
    stdlib wave module rejects.  The integer expansions are conformance-
    checked against stdlib audioop over every byte value (skipped where
    audioop is gone, 3.13+), and a full WAV payload decodes end-to-end."""
    import struct
    import warnings

    from knowhere_spark.operators.multimodal import (
        _alaw_to_linear,
        _ulaw_to_linear,
    )

    b = np.arange(256, dtype=np.uint8)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop

        ref_u = np.frombuffer(audioop.ulaw2lin(bytes(b), 2), dtype="<i2")
        ref_a = np.frombuffer(audioop.alaw2lin(bytes(b), 2), dtype="<i2")
        np.testing.assert_array_equal(_ulaw_to_linear(b), ref_u.astype(np.int64))
        np.testing.assert_array_equal(_alaw_to_linear(b), ref_a.astype(np.int64))
    except ImportError:
        pass
    # pinned values from the G.711 tables (audioop-independent anchors)
    assert _ulaw_to_linear(np.array([0xFF], dtype=np.uint8))[0] == 0
    assert _ulaw_to_linear(np.array([0x00], dtype=np.uint8))[0] == -32124
    assert _alaw_to_linear(np.array([0xD5], dtype=np.uint8))[0] == 8
    assert _alaw_to_linear(np.array([0x55], dtype=np.uint8))[0] == -8

    def g711_wav(payload_bytes, tag):
        fmt_body = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(payload_bytes)) + payload_bytes
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    got = decode_payload(g711_wav(bytes(b), 7), "audio", {})
    np.testing.assert_allclose(got, _ulaw_to_linear(b) / 32768.0)
    got_a = decode_payload(g711_wav(bytes(b), 6), "audio", {})
    np.testing.assert_allclose(got_a, _alaw_to_linear(b) / 32768.0)


def test_audio_neardup_pairs(spark):
    """Fourth near-dup modality: identical tones pair at cosine ~1,
    unrelated noise stays out; the decode+FFT kernel runs once
    (checkpoint discipline shared with image/video)."""
    from knowhere_spark.operators.multimodal import audio_neardup_pairs

    rng = np.random.default_rng(35)
    t = np.arange(2048) / 8000.0
    tone = np.sin(2 * np.pi * 440 * t) * 0.5
    noise = rng.uniform(-0.5, 0.5, 2048)
    meta = {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 8000}
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(_make_wav(tone)), meta),
            (2, "audio", bytearray(_make_wav(tone * 0.7)), meta),  # level change
            (3, "audio", bytearray(_make_wav(noise)), meta),
        ],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    out = audio_neardup_pairs(media, threshold=0.98).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert out[0].cosine >= 0.98


def test_audio_neardup_strategies_agree(spark):
    """VERDICT r9 #1: the banded SRP default must find the planted pairs
    the exact O(n²) verifier finds, with identical (true-cosine) scores
    — and the IVF route at nprobe=nlist must match too.  12 two-tone
    clips, each with a level-scaled (×0.8) re-upload."""
    import pytest

    from knowhere_spark.operators.multimodal import audio_neardup_pairs

    t = np.arange(2048) / 8000.0
    meta = {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 8000}
    rows = []
    for i in range(12):
        f1, f2 = 150 + 230 * i, 3900 - 290 * i
        sig = 0.4 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.sin(2 * np.pi * f2 * t)
        rows.append((i, "audio", bytearray(_make_wav(sig)), meta))
        rows.append((100 + i, "audio", bytearray(_make_wav(sig * 0.8)), meta))
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    planted = {(i, 100 + i) for i in range(12)}

    def pairs(df):
        return {(r.id_a, r.id_b): round(r.cosine, 9) for r in df.collect()}

    exact = pairs(audio_neardup_pairs(media, 0.98, strategy="exact"))
    assert planted <= set(exact)
    banded = pairs(audio_neardup_pairs(media, 0.98))  # default strategy
    assert banded == exact          # full recall on the planted corpus,
    ivf = pairs(                    # and TRUE cosines (precision 1.0)
        audio_neardup_pairs(media, 0.98, strategy="ivf", nlist=4, nprobe=4)
    )
    assert ivf == exact
    with pytest.raises(ValueError, match="strategy"):
        audio_neardup_pairs(media, 0.98, strategy="banana")


def test_audio_neardup_stop_hash_cap(spark):
    """r10: the banded default's stop-hash cap (video-operator
    discipline) — a flood of identical clips (dead air) past the cap
    must not create O(freq²) pairs on its own, while a normal planted
    pair still matches; uncapped, the flood links every pair."""
    from knowhere_spark.operators.multimodal import audio_neardup_pairs

    t = np.arange(2048) / 8000.0
    meta = {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 8000}
    dead = np.sin(2 * np.pi * 60 * t) * 0.1          # 8 identical clips
    tone = 0.4 * np.sin(2 * np.pi * 700 * t) + 0.2 * np.sin(2 * np.pi * 2900 * t)
    rows = [(i, "audio", bytearray(_make_wav(dead)), meta) for i in range(8)]
    rows += [
        (100, "audio", bytearray(_make_wav(tone)), meta),
        (101, "audio", bytearray(_make_wav(tone * 0.8)), meta),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    capped = {
        (r.id_a, r.id_b)
        for r in audio_neardup_pairs(media, 0.98, max_hash_freq=4).collect()
    }
    assert capped == {(100, 101)}          # flood dropped before banding
    uncapped = audio_neardup_pairs(media, 0.98, max_hash_freq=None).count()
    assert uncapped == 8 * 7 // 2 + 1      # every flood pair + the real one


def test_mjpeg_video_real_decode_end_to_end(spark):
    """r11 (VERDICT r10 #3): Motion JPEG is the second FULLY-real video
    codec path (after animated GIF) — an MP4 with `jpeg`-fourcc sample
    entries whose payloads are real baseline JPEGs goes mux → container
    parse → the repo's OWN T.81 decoder → pHash → near-dup pairs with
    no fake stage.  The proof that the real decoder (not the
    deterministic fake) fed the hash: the pipeline's per-frame pHash
    equals the pHash of the directly-decoded JPEG pixels."""
    from knowhere_spark.functions.jpeg import decode_jpeg
    from knowhere_spark.functions.mp4 import video_keyframes
    from knowhere_spark.operators.multimodal import (
        _dct_matrix,
        _decode_frame_pixels,
        _phash64_arr,
        decode_payload,
        sniff_format,
        synthesize_video_media,
        video_frame_phashes,
        video_neardup_pairs,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media = synthesize_video_media(docs, codec="mjpeg")

    # container layer: jpeg fourcc, frame payloads sniff as real JPEG
    row = media.filter(F.col("media_id") == 3).collect()[0]
    frames = video_keyframes(bytes(row["payload"]))
    assert len(frames) == 4 + 3 % 3
    assert all(f["codec"] == "jpeg" for f in frames)
    assert all(sniff_format(bytes(f["payload"])) == "jpeg" for f in frames)

    # decode layer: the sniff dispatch hits the REAL decoder — the frame
    # pixels equal a direct decode_jpeg, and differ from the fake path
    meta = {"width": 32, "height": 32, "n_frames": 1, "sample_rate": 0}
    p0 = bytes(frames[0]["payload"])
    via_sampler = _decode_frame_pixels(p0, "jpeg", 3, 0, None)
    direct = decode_jpeg(p0)
    assert np.array_equal(via_sampler, direct)
    assert np.array_equal(decode_payload(p0, "image", meta), direct)

    # hash layer: pipeline pHashes == pHash of directly-decoded pixels
    got = {
        (r["media_id"], r["frame_idx"]): r["phash"]
        for r in video_frame_phashes(media).collect()
    }
    D = _dct_matrix(32)
    weights = 1 << np.arange(64, dtype=np.uint64)
    for f in frames:
        expect = _phash64_arr(decode_jpeg(bytes(f["payload"])), D, weights)
        assert got[(3, f["frame_idx"])] == expect

    # pair layer: planted near-copies (d-1, d) at d % 4 == 1 and nothing
    # else — shared REAL-JPEG frames give identical pixels and hashes
    pairs = {
        (r["id_a"], r["id_b"])
        for r in video_neardup_pairs(
            media, min_overlap=0.5, max_hamming=0
        ).collect()
    }
    assert pairs == {(d - 1, d) for d in range(12) if d % 4 == 1 and d >= 1}

    # scene sampling at its exact point agrees on the same real bits
    scene_pairs = {
        (r["id_a"], r["id_b"])
        for r in video_neardup_pairs(
            media, min_overlap=0.5, max_hamming=0,
            sample="scenes", scene_min_hamming=0,
        ).collect()
    }
    assert scene_pairs == pairs


def test_encode_jpeg_gray_roundtrip_and_validation():
    """The library encoder (functions/jpeg.encode_jpeg_gray) emits real
    baseline JFIF bitstreams the library decoder reads back within
    quantization error; deterministic; input validation raises."""
    import pytest

    from knowhere_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(5)
    for h, w in ((32, 32), (24, 20), (8, 8), (9, 17)):
        px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        data = encode_jpeg_gray(px)
        assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
        dec = decode_jpeg(data) * 255.0
        assert dec.shape == (h, w)
        # flat q=8 bounds per-coefficient error at 4; pixel error is the
        # IDCT mix of 64 such errors — empirically < 16 on noise images
        assert np.abs(dec - px).max() < 16.0
        assert encode_jpeg_gray(px) == data
    smooth = np.tile(np.arange(32, dtype=np.uint8), (32, 1))
    dec = decode_jpeg(encode_jpeg_gray(smooth)) * 255.0
    assert np.abs(dec - smooth).max() < 6.0   # smooth content: small loss
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((0, 4)))
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((4, 4, 3)))
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((8, 8)), q_table=np.zeros(64))


def test_enc_scan_matches_reference_bit_writer():
    """r12: the vectorized entropy emitter (functions/jpeg._enc_scan)
    must be bit-identical to a straightforward per-symbol reference of
    T.81 F.1.2 — per-coefficient magnitude categories, ZRL runs, EOB,
    MSB-first bit packing, 1-bit padding and 0xFF stuffing.  The
    reference here is independent of the library implementation (the
    pre-r12 per-symbol writer re-expressed), so a regression in either
    the vectorized category/run math or the accumulator flush shows up
    as a byte diff."""
    from knowhere_spark.functions.jpeg import (
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _enc_codes,
        _enc_scan,
    )

    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    def ref_scan(zz):
        bits = []

        def emit(code, ln):
            for i in range(ln - 1, -1, -1):
                bits.append((code >> i) & 1)

        pred = 0
        for blk in zz:
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            t = abs(diff).bit_length()
            emit(*dc_codes[t])
            if t:
                emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
            nz = [i for i in range(1, 64) if blk[i]]
            k, run = 1, 0
            for k in range(1, (nz[-1] if nz else 0) + 1):
                if blk[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    emit(*ac_codes[0xF0])
                    run -= 16
                v = int(blk[k])
                s = abs(v).bit_length()
                emit(*ac_codes[(run << 4) | s])
                emit(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if not nz or nz[-1] < 63:
                emit(*ac_codes[0x00])
        while len(bits) % 8:
            bits.append(1)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            raw.append(int("".join(map(str, bits[i : i + 8])), 2))
        return bytes(raw).replace(b"\xff", b"\xff\x00")

    rng = np.random.default_rng(11)
    corpora = [
        rng.integers(-1024, 1024, size=(6, 64)),          # dense noise
        np.zeros((4, 64), dtype=np.int64),                # all-EOB
        np.where(rng.random((5, 64)) < 0.05,               # long runs/ZRL
                 rng.integers(-3, 4, (5, 64)), 0),
        np.concatenate([np.zeros((1, 63)), [[7]]], axis=1  # nz at k=63
                       ).astype(np.int64),
    ]
    # force a stuffed 0xFF and a DC-only block edge
    big = np.zeros((2, 64), dtype=np.int64)
    big[0, 0], big[1, 0] = 1023, -1023
    corpora.append(big)
    for zz in corpora:
        zz = np.ascontiguousarray(zz, dtype=np.int64)
        assert _enc_scan(zz, dc_codes, ac_codes) == ref_scan(zz)


def test_transcode_images_jpeg_mixed_corpus(spark):
    """r11: the compressed thumbnail stage — decode (PNM RGB / PNG) →
    resize → grayscale → REAL baseline-JPEG re-encode; output sniffs as
    JPEG, decodes through the repo's own decoder to the resampled gray
    source within quantization error, is smaller than the PNM twin, and
    non-image rows pass through untouched."""
    import zlib

    from knowhere_spark.functions.jpeg import decode_jpeg
    from knowhere_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _nn_resample,
        decode_payload,
        resize_images,
        sniff_format,
        transcode_images_jpeg,
    )

    rng = np.random.default_rng(7)
    # real P6 RGB
    rgb = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    p6 = b"P6\n30 40\n255\n" + rgb.tobytes()
    # real gray 8-bit PNG (filter 0 rows)
    import struct

    g = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(
            b"".join(b"\x00" + g[i].tobytes() for i in range(16))))
        + chunk(b"IEND", b"")
    )
    meta = {"width": 0, "height": 0, "n_frames": 1, "sample_rate": 0}
    rows = [
        (0, "image", bytearray(p6), dict(meta)),
        (1, "image", bytearray(png), dict(meta)),
        (2, "audio", bytearray(b"not an image"), dict(meta)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           transcode_images_jpeg(media, width=24, height=24).collect()}

    for mid, src in ((0, p6), (1, png)):
        payload = bytes(out[mid]["payload"])
        assert sniff_format(payload) == "jpeg"
        dec = decode_jpeg(payload) * 255.0
        assert dec.shape == (24, 24)
        assert out[mid]["meta"]["width"] == 24
        arr = decode_payload(src, "image", meta)
        if arr.ndim == 3:
            arr = arr.mean(axis=2)
        want = _nn_resample(arr, 24, 24) * 255.0
        assert np.abs(dec - want).max() < 16.0   # flat-q quant error bound
    assert bytes(out[2]["payload"]) == b"not an image"

    # deterministic, and smaller than the uncompressed PNM twin
    again = {r["media_id"]: bytes(r["payload"]) for r in
             transcode_images_jpeg(media, width=24, height=24).collect()}
    assert again[0] == bytes(out[0]["payload"])
    pnm_twin = {r["media_id"]: bytes(r["payload"]) for r in
                resize_images(media, 24, 24).collect()}
    assert len(bytes(out[0]["payload"])) < len(pnm_twin[0])


def test_reencode_stages_total_on_mistyped_rows(spark):
    """r11 review fix: a valid WAV payload in an image-TYPED row decodes
    (by magic-byte dispatch) to a 1-D sample array — both re-encode
    stages must survive it via the deterministic-fake fallback instead
    of killing the corpus-scale job; and a bad q_table must fail fast at
    the driver, not as a mid-job task failure."""
    import struct
    import wave as _wave
    from io import BytesIO

    import pytest

    from knowhere_spark.functions.jpeg import decode_jpeg
    from knowhere_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
        sniff_format,
        transcode_images_jpeg,
    )

    buf = BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<100h", *range(100)))
    wav = buf.getvalue()
    assert sniff_format(wav) == "wav"

    meta = {"width": 8, "height": 8, "n_frames": 1, "sample_rate": 8000}
    media = spark.createDataFrame(
        [(0, "image", bytearray(wav), meta)], MEDIA_SCHEMA
    )
    pnm = bytes(resize_images(media, 8, 8).collect()[0]["payload"])
    assert pnm[:2] == b"P6"               # valid fake image, job alive
    jpg = bytes(transcode_images_jpeg(media, width=8, height=8)
                .collect()[0]["payload"])
    assert sniff_format(jpg) == "jpeg"
    assert decode_jpeg(jpg).shape == (8, 8)

    with pytest.raises(ValueError, match="quant steps"):
        transcode_images_jpeg(media, q_table=np.zeros(64))
    with pytest.raises(ValueError):
        transcode_images_jpeg(media, q_table=np.ones(32))
