"""Baseline JPEG decoder (functions/jpeg.py) — exact recovery against an
independent minimal encoder built from the T.81 Annex K standard tables.

The exactness argument: the test chooses INTEGER quantized coefficients,
the encoder Huffman-codes them, and the decoder must reproduce exactly
``clip(IDCT(coeff × q) + 128, 0, 255) / 255`` computed independently in
float64 — Huffman, zigzag, dequant, IDCT, level shift and the color
transform are all pinned (JPEG's loss lives in the encoder's forward
quantization, which the fixture sidesteps by starting from integers).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from knowhere_spark.functions.jpeg import _C, _ZIGZAG, decode_jpeg

# --- T.81 Annex K standard Huffman tables (public spec constants) ---------
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)                  # pad with 1s
        return bytes(self.bytes)


def _category(v):
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(w, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    run = 0
    last_nz = max([i for i in range(1, 64) if zz[i]] or [0])
    while k <= last_nz:
        if zz[k] == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]         # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(int(zz[k]))
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        v = int(zz[k])
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if last_nz < 63:
        code, ln = ac_codes[0x00]             # EOB
        w.write(code, ln)
    return int(zz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(coeffs, h, w, q_tables, sampling, restart_interval=0,
                sof_marker=0xC0, prec=8):
    """Minimal baseline encoder.  ``coeffs``: list per component of int
    arrays ``(n_blocks_in_decode_order, 64)`` (zigzag-quantized);
    ``sampling``: list of (h_i, v_i); component c uses quant table 0 if
    c == 0 else 1, and the Annex K lum/chrom Huffman tables likewise."""
    nc = len(coeffs)
    out = bytearray(b"\xff\xd8")
    dqt = b""
    for tq, q in enumerate(q_tables):
        dqt += bytes([tq]) + bytes(int(x) for x in q)
    out += _seg(0xDB, dqt)
    sof = struct.pack(">BHHB", prec, h, w, nc)
    for c in range(nc):
        hi, vi = sampling[c]
        sof += bytes([c + 1, (hi << 4) | vi, 0 if c == 0 else 1])
    out += _seg(sof_marker, sof)
    dht = b""
    for tc_th, (bits, vals) in (
        (0x00, (DC_LUM_BITS, DC_LUM_VALS)), (0x10, (AC_LUM_BITS, AC_LUM_VALS)),
        (0x01, (DC_CHR_BITS, DC_CHR_VALS)), (0x11, (AC_CHR_BITS, AC_CHR_VALS)),
    ):
        dht += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        td_ta = 0x00 if c == 0 else 0x11
        sos += bytes([c + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_lum, ac_lum = _codes(DC_LUM_BITS, DC_LUM_VALS), _codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr, ac_chr = _codes(DC_CHR_BITS, DC_CHR_VALS), _codes(AC_CHR_BITS, AC_CHR_VALS)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    mcu_total = mcux * mcuy
    block_idx = [0] * nc
    preds = [0] * nc
    writer = _BitWriter()
    per = restart_interval if restart_interval else mcu_total
    rst = 0
    for mcu in range(mcu_total):
        if restart_interval and mcu and mcu % per == 0:
            out += writer.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * nc
        for c in range(nc):
            dc_c, ac_c = (dc_lum, ac_lum) if c == 0 else (dc_chr, ac_chr)
            for _ in range(sampling[c][0] * sampling[c][1]):
                preds[c] = _encode_block(
                    writer, coeffs[c][block_idx[c]], preds[c], dc_c, ac_c
                )
                block_idx[c] += 1
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _expected_plane(coeffs, q, mcuy, mcux, hi, vi):
    """clip(IDCT(coeff × q) + 128) assembled in decode order (float64)."""
    plane = np.zeros((mcuy * 8 * vi, mcux * 8 * hi))
    b = 0
    for mcu in range(mcuy * mcux):
        my, mx = divmod(mcu, mcux)
        for vy in range(vi):
            for hx in range(hi):
                blk = np.zeros(64)
                blk[_ZIGZAG] = coeffs[b] * q
                px = _C.T @ blk.reshape(8, 8) @ _C
                y0 = (my * vi + vy) * 8
                x0 = (mx * hi + hx) * 8
                plane[y0 : y0 + 8, x0 : x0 + 8] = px
                b += 1
    return plane + 128.0


def _rand_coeffs(rng, n_blocks, dense=0.3):
    zz = rng.integers(-40, 41, size=(n_blocks, 64))
    zz[rng.random((n_blocks, 64)) > dense] = 0
    zz[:, 0] = rng.integers(-60, 61, size=n_blocks)   # always a DC value
    return zz.astype(np.int64)


Q_LUM = np.full(64, 3, dtype=np.int64)
Q_CHR = np.full(64, 5, dtype=np.int64)


def test_jpeg_gray_exact_recovery():
    rng = np.random.default_rng(7)
    h, w = 24, 16                      # 3x2 MCUs of 8x8
    zz = _rand_coeffs(rng, 6)
    data = encode_jpeg([zz], h, w, [Q_LUM], [(1, 1)])
    got = decode_jpeg(data)
    exp = np.clip(_expected_plane(zz, Q_LUM, 3, 2, 1, 1), 0, 255)[:h, :w] / 255.0
    assert got.shape == (h, w)
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_dqt_redefinition_after_sos_rejected():
    # _render dequantizes once with the FINAL DQT state, so a mid-image
    # redefinition would silently use the wrong table for earlier scans
    # — the decoder must refuse it (libjpeg behavior).  A re-emitted
    # IDENTICAL table (some encoders repeat DQT per scan) stays legal.
    rng = np.random.default_rng(11)
    zz = _rand_coeffs(rng, 6)
    data = encode_jpeg([zz], 24, 16, [Q_LUM], [(1, 1)])
    changed = np.array(Q_LUM, dtype=np.int64).copy()
    changed[0] += 1
    bad = (
        data[:-2]
        + _seg(0xDB, bytes([0]) + bytes(int(x) for x in changed))
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="redefined after SOS"):
        decode_jpeg(bad)
    same = (
        data[:-2]
        + _seg(0xDB, bytes([0]) + bytes(int(x) for x in Q_LUM))
        + b"\xff\xd9"
    )
    np.testing.assert_array_equal(decode_jpeg(same), decode_jpeg(data))


def test_jpeg_color_444_exact_recovery():
    rng = np.random.default_rng(8)
    h, w = 16, 16
    zzs = [_rand_coeffs(rng, 4) for _ in range(3)]
    data = encode_jpeg(zzs, h, w, [Q_LUM, Q_CHR], [(1, 1)] * 3)
    got = decode_jpeg(data)
    assert got.shape == (h, w, 3)
    planes = [
        np.clip(_expected_plane(zzs[c], Q_LUM if c == 0 else Q_CHR, 2, 2, 1, 1),
                0, 255)[:h, :w]
        for c in range(3)
    ]
    y, cb, cr = planes
    # decoder clamps each plane to [0,255] BEFORE the transform (libjpeg
    # range-limit semantics), then clips the RGB result
    exp = np.clip(
        np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        ),
        0, 255,
    ) / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_420_subsampled_constant_chroma():
    """4:2:0: luma varies per pixel (exactness through the subsampled MCU
    geometry), chroma constant (pixel-replication upsample is exact)."""
    rng = np.random.default_rng(9)
    h, w = 16, 16                     # one 16x16 MCU: 4 luma + 1+1 chroma
    zz_y = _rand_coeffs(rng, 4)
    zz_cb = np.zeros((1, 64), dtype=np.int64)
    zz_cr = np.zeros((1, 64), dtype=np.int64)
    zz_cb[0, 0] = 4                   # constant offset per chroma plane
    zz_cr[0, 0] = -4
    data = encode_jpeg(
        [zz_y, zz_cb, zz_cr], h, w, [Q_LUM, Q_CHR],
        [(2, 2), (1, 1), (1, 1)],
    )
    got = decode_jpeg(data)
    assert got.shape == (h, w, 3)
    y = np.clip(_expected_plane(zz_y, Q_LUM, 1, 1, 2, 2), 0, 255)
    cb = 128.0 + zz_cb[0, 0] * Q_CHR[0] / 8.0   # DC-only IDCT = coeff/8
    cr = 128.0 + zz_cr[0, 0] * Q_CHR[0] / 8.0
    exp = np.clip(
        np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        ),
        0, 255,
    ) / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_restart_markers():
    rng = np.random.default_rng(10)
    h, w = 8, 40                      # 5 MCUs in a row, DRI=2 → RST0, RST1
    zz = _rand_coeffs(rng, 5)
    data = encode_jpeg([zz], h, w, [Q_LUM], [(1, 1)], restart_interval=2)
    assert b"\xff\xd0" in data
    got = decode_jpeg(data)
    exp = np.clip(_expected_plane(zz, Q_LUM, 1, 5, 1, 1), 0, 255)[:h, :w] / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_arithmetic_rejected():
    """Arithmetic coding stays recognized-but-undecodable (r9: SOF2
    progressive now DECODES — see the progressive suite below)."""
    rng = np.random.default_rng(11)
    zz = _rand_coeffs(rng, 1)
    data = encode_jpeg([zz], 8, 8, [Q_LUM], [(1, 1)], sof_marker=0xC9)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(data)
    data = encode_jpeg([zz], 8, 8, [Q_LUM], [(1, 1)], sof_marker=0xCA)
    with pytest.raises(NotImplementedError, match="arithmetic progressive"):
        decode_jpeg(data)


def test_decode_payload_dispatches_real_jpeg():
    """multimodal.decode_payload now decodes baseline JPEG for real; a
    sniffed-but-corrupt payload still falls back to the deterministic
    fake instead of crashing the kernel."""
    from knowhere_spark.operators.multimodal import decode_payload

    rng = np.random.default_rng(12)
    zz = _rand_coeffs(rng, 6)
    data = encode_jpeg([zz], 24, 16, [Q_LUM], [(1, 1)])
    meta = {"height": 24, "width": 16}
    got = decode_payload(data, "image", meta)
    exp = np.clip(_expected_plane(zz, Q_LUM, 3, 2, 1, 1), 0, 255)[:24, :16] / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)
    # corrupt-after-sniff: JPEG magic + garbage → deterministic fake
    fake = decode_payload(b"\xff\xd8\xffgarbage", "image", meta)
    assert fake.shape == (24, 16, 3)
    # injected decoder still wins over the built-in
    marker = np.full((2, 2), 0.5)
    got2 = decode_payload(
        data, "image", meta, decoders={"jpeg": lambda p, m: marker}
    )
    np.testing.assert_allclose(got2, marker)


def test_jpeg_phash_pipeline(spark):
    """pHash over a real JPEG payload through the Spark kernel — the
    decode path engages (a fake-pixel pHash would differ)."""
    from knowhere_spark.operators.multimodal import image_phash

    rng = np.random.default_rng(13)
    zz = _rand_coeffs(rng, 6, dense=0.6)
    data = encode_jpeg([zz], 24, 16, [Q_LUM], [(1, 1)])
    media = spark.createDataFrame(
        [(1, "image", bytearray(data), {"height": "24", "width": "16"}),
         (2, "image", bytearray(data), {"height": "24", "width": "16"})],
        "media_id long, media_type string, payload binary, meta map<string,string>",
    )
    out = image_phash(media).collect()
    assert len(out) == 2
    # identical payloads → identical hashes (content-derived, not fake)
    assert out[0]["phash"] == out[1]["phash"]


def test_jpeg_fill_bytes_between_segments():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    — legal files from padding encoders must decode identically."""
    rng = np.random.default_rng(17)
    h, w = 16, 16
    zz = _rand_coeffs(rng, 4)
    data = encode_jpeg([zz], h, w, [Q_LUM], [(1, 1)])
    # inject fill bytes after SOI and again before the DQT marker
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    np.testing.assert_allclose(decode_jpeg(padded), decode_jpeg(data))


def test_jpeg_gray_with_declared_sampling_is_raster():
    """A single-component frame is NON-interleaved whatever its declared
    sampling factors (T.81 A.2) — a 2x2 declaration must decode exactly
    like the same blocks declared 1x1, not as permuted 2x2 MCUs."""
    rng = np.random.default_rng(18)
    h, w = 24, 16
    zz = _rand_coeffs(rng, 6)
    base = encode_jpeg([zz], h, w, [Q_LUM], [(1, 1)])
    # same entropy stream, SOF rewritten to claim 2x2 sampling: the
    # sampling byte for component 0 sits 6 bytes into the SOF body
    hacked = bytearray(base)
    sof_at = hacked.find(b"\xff\xc0")
    assert sof_at > 0
    assert hacked[sof_at + 11] == 0x11
    hacked[sof_at + 11] = 0x22
    np.testing.assert_allclose(
        decode_jpeg(bytes(hacked)), decode_jpeg(base)
    )


def test_jpeg_truncated_in_fill_bytes_raises_valueerror():
    """A buffer ending in 0xFF fill bytes must raise ValueError, never
    IndexError: exif_tags / strip_exif_gps catch only ValueError at the
    marker walk, and one truncated JPEG must not crash a whole
    mapInPandas scrub stage (ingest is total)."""
    from knowhere_spark.functions.jpeg import iter_jpeg_segments

    for bad in (b"\xff\xd8\xff\xff", b"\xff\xd8\xff\xff\xff",
                b"\xff\xd8\xff\xe0\x00\x04ab\xff\xff"):
        with pytest.raises(ValueError):
            list(iter_jpeg_segments(bad))


# --- progressive (SOF2) mirror encoder ------------------------------------
# Universal flat Huffman tables: every DC category at 8 bits, every AC
# (run,size) byte split over 8/9 bits — valid canonical tables that let
# one DHT serve every progressive scan without per-scan histograms.
_PDC_BITS = [0, 0, 0, 0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0]
_PDC_VALS = list(range(16))
_PAC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_PAC_VALS = list(range(256))
_PDC_CODES = _codes(_PDC_BITS, _PDC_VALS)
_PAC_CODES = _codes(_PAC_BITS, _PAC_VALS)


class _ProgScanWriter:
    """Entropy writer for one progressive scan: bit writer + EOB-run
    state (+ the refinement correction bits that ride with it)."""

    def __init__(self, out: bytearray):
        self.out = out
        self.w = _BitWriter()
        self.eobrun = 0
        self.pending: list[int] = []          # correction bits on the run

    def sym_ac(self, s):
        code, ln = _PAC_CODES[s]
        self.w.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.sym_ac(r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            for b in self.pending:
                self.w.write(b, 1)
            self.eobrun = 0
            self.pending = []

    def restart(self, rst_idx):
        self.flush_eobrun()
        self.out += self.w.flush()
        self.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
        self.w = _BitWriter()

    def finish(self):
        self.flush_eobrun()
        self.out += self.w.flush()


def _enc_dc_prog(sw, c0, pred, ah, al):
    if ah == 0:
        v = int(c0) >> al
        diff = v - pred
        t = _category(diff)
        code, ln = _PDC_CODES[t]
        sw.w.write(code, ln)
        if t:
            sw.w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return v
    sw.w.write((int(c0) >> al) & 1, 1)
    return pred


def _enc_ac_first(sw, zz, ss, se, al):
    mags = [(abs(int(zz[k])) >> al, 1 if zz[k] > 0 else 0)
            for k in range(ss, se + 1)]
    if not any(m for m, _ in mags):
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    run = 0
    last_nz = max(i for i, (m, _) in enumerate(mags) if m)
    for i, (m, pos) in enumerate(mags):
        if i > last_nz:
            break
        if m == 0:
            run += 1
            continue
        while run > 15:
            sw.sym_ac(0xF0)                     # ZRL
            run -= 16
        s = m.bit_length()
        sw.sym_ac((run << 4) | s)
        v = m if pos else -m
        sw.w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < len(mags) - 1:
        sw.eobrun += 1


def _enc_ac_refine(sw, zz, ss, se, ah, al):
    """The jdphuff refinement emitter re-derived: newly-nonzero coeffs
    as (run,1)+sign, correction bits for history-nonzero coeffs
    buffered and flushed after the next symbol (or with the EOB run)."""
    mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eobpos = max((i for i, m in enumerate(mags) if m == 1), default=-1)
    run = 0
    br: list[int] = []
    for i, m in enumerate(mags):
        if m == 0:
            run += 1
            continue
        while run > 15 and i <= eobpos:
            sw.flush_eobrun()
            sw.sym_ac(0xF0)
            run -= 16
            for b in br:
                sw.w.write(b, 1)
            br = []
        if m > 1:                               # history-nonzero
            br.append(m & 1)
            continue
        sw.flush_eobrun()                       # newly nonzero (m == 1)
        sw.sym_ac((run << 4) | 1)
        sw.w.write(1 if zz[ss + i] > 0 else 0, 1)
        for b in br:
            sw.w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        sw.eobrun += 1
        sw.pending.extend(br)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def encode_jpeg_progressive(grids, h, w, q_tables, sampling, scans,
                            restart_interval=0, prec=8):
    """Minimal progressive encoder.  ``grids``: per component an int
    array ``(mcuy*v, mcux*h, 64)`` of zigzag-quantized coefficients
    (MCU-padded; dummy blocks only coded in interleaved DC scans).
    ``scans``: dicts ``{"comps": [idx...], "ss","se","ah","al"}``."""
    nc = len(grids)
    out = bytearray(b"\xff\xd8")
    dqt = b""
    for tq, q in enumerate(q_tables):
        dqt += bytes([tq]) + bytes(int(x) for x in q)
    out += _seg(0xDB, dqt)
    sof = struct.pack(">BHHB", prec, h, w, nc)
    for c in range(nc):
        hi, vi = sampling[c]
        sof += bytes([c + 1, (hi << 4) | vi, 0 if c == 0 else 1])
    out += _seg(0xC2, sof)
    dht = bytes([0x00]) + bytes(_PDC_BITS) + bytes(_PDC_VALS)
    dht += bytes([0x10]) + bytes(_PAC_BITS) + bytes(_PAC_VALS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for scan in scans:
        comps, ss, se = scan["comps"], scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        sos = bytes([len(comps)])
        for c in comps:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        sw = _ProgScanWriter(out)
        rst = 0
        if len(comps) == 1:
            c = comps[0]
            hi, vi = sampling[c] if nc > 1 else (1, 1)
            cw = -(-w * hi // hmax)
            ch = -(-h * vi // vmax)
            bh, bw = -(-ch // 8), -(-cw // 8)
            pred = 0
            for u in range(bh * bw):
                if restart_interval and u and u % restart_interval == 0:
                    sw.restart(rst)
                    rst += 1
                    pred = 0
                zz = grids[c][divmod(u, bw)]
                if ss == 0:
                    pred = _enc_dc_prog(sw, zz[0], pred, ah, al)
                elif ah == 0:
                    _enc_ac_first(sw, zz, ss, se, al)
                else:
                    _enc_ac_refine(sw, zz, ss, se, ah, al)
        else:
            assert ss == 0 and se == 0, "interleaved scans are DC-only"
            preds = {c: 0 for c in comps}
            for mcu in range(mcux * mcuy):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    sw.restart(rst)
                    rst += 1
                    preds = {c: 0 for c in comps}
                my, mx = divmod(mcu, mcux)
                for c in comps:
                    hi, vi = sampling[c]
                    for vy in range(vi):
                        for hx in range(hi):
                            zz = grids[c][my * vi + vy, mx * hi + hx]
                            preds[c] = _enc_dc_prog(sw, zz[0], preds[c], ah, al)
        sw.finish()
    out += b"\xff\xd9"
    return bytes(out)


def _prog_grid(rng, by, bx, real_by=None, real_bx=None, dense=0.3):
    g = rng.integers(-40, 41, size=(by, bx, 64))
    g[rng.random((by, bx, 64)) > dense] = 0
    g[..., 0] = rng.integers(-60, 61, size=(by, bx))
    # MCU-padding dummy blocks are coded only in interleaved DC scans —
    # their AC must be zero in the fixture (never transmitted)
    if real_by is not None:
        g[real_by:, :, 1:] = 0
    if real_bx is not None:
        g[:, real_bx:, 1:] = 0
    return g.astype(np.int64)


def _expected_plane_grid(grid, q):
    by, bx = grid.shape[:2]
    plane = np.zeros((by * 8, bx * 8))
    for y in range(by):
        for x in range(bx):
            blk = np.zeros(64)
            blk[_ZIGZAG] = grid[y, x] * q
            plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                _C.T @ blk.reshape(8, 8) @ _C
            )
    return plane + 128.0


#: the libjpeg-style full refinement script for one component: DC
#: first@Al=1 + refine, AC split-band first@Al=2 + two refine sweeps
_GRAY_SCRIPT = [
    {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 1},
    {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
    {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
    {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
    {"comps": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
]


def test_jpeg_progressive_gray_exact_recovery():
    """Full successive-approximation script refined to Al=0 must recover
    clip(IDCT(coeff x q) + 128) EXACTLY — spectral selection, DC/AC
    first + refinement, EOB runs all pinned."""
    rng = np.random.default_rng(21)
    h, w = 24, 16
    grid = _prog_grid(rng, 3, 2)
    data = encode_jpeg_progressive([grid], h, w, [Q_LUM], [(1, 1)], _GRAY_SCRIPT)
    got = decode_jpeg(data)
    assert got.shape == (h, w)
    exp = np.clip(_expected_plane_grid(grid, Q_LUM), 0, 255)[:h, :w] / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_progressive_matches_baseline_decode():
    """The same coefficients encoded baseline and progressive must
    decode to the IDENTICAL array (downstream pHash equality)."""
    rng = np.random.default_rng(22)
    h, w = 16, 24
    grid = _prog_grid(rng, 2, 3)
    base = encode_jpeg([grid.reshape(-1, 64)], h, w, [Q_LUM], [(1, 1)])
    prog = encode_jpeg_progressive([grid], h, w, [Q_LUM], [(1, 1)], _GRAY_SCRIPT)
    np.testing.assert_array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_jpeg_progressive_color_420_edge_dims():
    """4:2:0 at 24x24: the luma MCU-padded grid is 4x4 but its REAL
    grid is 3x3 — non-interleaved AC scans cover only real blocks
    (T.81 A.2.2), while the interleaved DC scan covers dummy blocks
    too.  A decoder indexing the padded grid in AC scans desyncs."""
    rng = np.random.default_rng(23)
    h = w = 24
    gy = _prog_grid(rng, 4, 4, real_by=3, real_bx=3)
    gcb = _prog_grid(rng, 2, 2, dense=0.2)
    gcr = _prog_grid(rng, 2, 2, dense=0.2)
    scans = [
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
        {"comps": [0], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0},
        {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
    ]
    data = encode_jpeg_progressive(
        [gy, gcb, gcr], h, w, [Q_LUM, Q_CHR],
        [(2, 2), (1, 1), (1, 1)], scans,
    )
    got = decode_jpeg(data)
    assert got.shape == (h, w, 3)
    y = np.clip(_expected_plane_grid(gy, Q_LUM), 0, 255)
    cb = np.clip(_expected_plane_grid(gcb, Q_CHR), 0, 255)
    cr = np.clip(_expected_plane_grid(gcr, Q_CHR), 0, 255)
    cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    y, cb, cr = y[:h, :w], cb[:h, :w], cr[:h, :w]
    exp = np.clip(
        np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        ),
        0, 255,
    ) / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_progressive_restarts_and_eob_runs():
    """Sparse coefficients over many blocks: EOBn runs with r > 0 (and
    their piggybacked refinement correction bits) plus DRI restarts,
    which reset both the DC predictor and the EOB run."""
    rng = np.random.default_rng(24)
    h, w = 8, 96                       # 12 blocks in a row
    grid = _prog_grid(rng, 1, 12, dense=0.04)
    grid[0, 2:9, 1:] = 0               # a 7-block all-zero AC stretch
    data = encode_jpeg_progressive(
        [grid], h, w, [Q_LUM], [(1, 1)], _GRAY_SCRIPT, restart_interval=5,
    )
    assert b"\xff\xd0" in data         # restarts really present
    got = decode_jpeg(data)
    exp = np.clip(_expected_plane_grid(grid, Q_LUM), 0, 255)[:h, :w] / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_progressive_malformed_scan_headers_raise():
    """Progressive structural violations are ValueError (caller contract:
    fall back, never crash): a DC+AC mixed band, a multi-component AC
    scan."""
    rng = np.random.default_rng(25)
    grid = _prog_grid(rng, 1, 1)
    bad_band = [{"comps": [0], "ss": 0, "se": 63, "ah": 0, "al": 0}]
    data = encode_jpeg_progressive([grid], 8, 8, [Q_LUM], [(1, 1)], bad_band)
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(data)


def encode_jpeg_multiscan(grids, h, w, q_tables, sampling):
    """Sequential NON-interleaved encoder: one scan per component, each
    coded in the component's real-grid raster order with the Annex K
    tables — the multi-scan layout some sequential encoders emit."""
    nc = len(grids)
    out = bytearray(b"\xff\xd8")
    dqt = b""
    for tq, q in enumerate(q_tables):
        dqt += bytes([tq]) + bytes(int(x) for x in q)
    out += _seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        hi, vi = sampling[c]
        sof += bytes([c + 1, (hi << 4) | vi, 0 if c == 0 else 1])
    out += _seg(0xC0, sof)
    dht = b""
    for tc_th, (bits, vals) in (
        (0x00, (DC_LUM_BITS, DC_LUM_VALS)), (0x10, (AC_LUM_BITS, AC_LUM_VALS)),
        (0x01, (DC_CHR_BITS, DC_CHR_VALS)), (0x11, (AC_CHR_BITS, AC_CHR_VALS)),
    ):
        dht += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, dht)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    for c in range(nc):
        td_ta = 0x00 if c == 0 else 0x11
        out += _seg(0xDA, bytes([1, c + 1, td_ta, 0, 63, 0]))
        dc_c = _codes(*(
            (DC_LUM_BITS, DC_LUM_VALS) if c == 0 else (DC_CHR_BITS, DC_CHR_VALS)
        ))
        ac_c = _codes(*(
            (AC_LUM_BITS, AC_LUM_VALS) if c == 0 else (AC_CHR_BITS, AC_CHR_VALS)
        ))
        hi, vi = sampling[c] if nc > 1 else (1, 1)
        bw = -(-(-(-w * hi // hmax)) // 8)
        bh = -(-(-(-h * vi // vmax)) // 8)
        writer = _BitWriter()
        pred = 0
        for u in range(bh * bw):
            pred = _encode_block(
                writer, grids[c][divmod(u, bw)], pred, dc_c, ac_c
            )
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_sequential_multiscan_noninterleaved():
    """Per-component sequential scans (Ns=1 each) at 4:2:0 with edge
    dims: AC+DC coded over the REAL 3x3 luma grid while the padded grid
    is 4x4 — the r8 decoder raised NotImplementedError here."""
    rng = np.random.default_rng(26)
    h = w = 24
    gy = _prog_grid(rng, 4, 4, real_by=3, real_bx=3)
    gy[3:, :, 0] = 0                  # dummy blocks never coded at all
    gy[:, 3:, 0] = 0                  #   (unlike the progressive DC scan)
    gcb = _prog_grid(rng, 2, 2, dense=0.2)
    gcr = _prog_grid(rng, 2, 2, dense=0.2)
    data = encode_jpeg_multiscan(
        [gy, gcb, gcr], h, w, [Q_LUM, Q_CHR], [(2, 2), (1, 1), (1, 1)]
    )
    got = decode_jpeg(data)
    assert got.shape == (h, w, 3)
    y = np.clip(_expected_plane_grid(gy, Q_LUM), 0, 255)
    cb = np.clip(_expected_plane_grid(gcb, Q_CHR), 0, 255)
    cr = np.clip(_expected_plane_grid(gcr, Q_CHR), 0, 255)
    cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    y, cb, cr = y[:h, :w], cb[:h, :w], cr[:h, :w]
    exp = np.clip(
        np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        ),
        0, 255,
    ) / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_sequential_multiscan_matches_interleaved():
    """The same 4:4:4 coefficients through one interleaved scan and
    through three per-component scans must decode identically."""
    rng = np.random.default_rng(27)
    h, w = 16, 16
    grids = [_prog_grid(rng, 2, 2) for _ in range(3)]
    inter = encode_jpeg(
        [g.reshape(-1, 64) for g in grids], h, w, [Q_LUM, Q_CHR], [(1, 1)] * 3
    )
    multi = encode_jpeg_multiscan(
        grids, h, w, [Q_LUM, Q_CHR], [(1, 1)] * 3
    )
    np.testing.assert_array_equal(decode_jpeg(inter), decode_jpeg(multi))


@pytest.mark.parametrize("seed", [1003, 1011, 1017, 1024, 1031])
def test_jpeg_progressive_randomized_scripts(seed):
    """Property sweep: random grid dims/density, random spectral split,
    random DC/AC Al chains, random restart interval — full refinement
    must always recover exactly (a 40-config in-session fuzz passed;
    these seeds pin representative shapes)."""
    rng = np.random.default_rng(seed)
    by, bx = int(rng.integers(1, 5)), int(rng.integers(1, 5))
    h = by * 8 - int(rng.integers(0, 8))
    w = bx * 8 - int(rng.integers(0, 8))
    grid = _prog_grid(rng, by, bx, dense=float(rng.uniform(0.02, 0.6)))
    split = int(rng.integers(1, 63))
    al0 = int(rng.integers(0, 3))
    scans = [{"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": al0}]
    for a in range(al0, 0, -1):
        scans.append({"comps": [0], "ss": 0, "se": 0, "ah": a, "al": a - 1})
    ala = int(rng.integers(0, 3))
    scans.append({"comps": [0], "ss": 1, "se": split, "ah": 0, "al": ala})
    scans.append({"comps": [0], "ss": split + 1, "se": 63, "ah": 0, "al": ala})
    for a in range(ala, 0, -1):
        scans.append({"comps": [0], "ss": 1, "se": 63, "ah": a, "al": a - 1})
    data = encode_jpeg_progressive(
        [grid], h, w, [Q_LUM], [(1, 1)], scans,
        restart_interval=int(rng.integers(0, 4)),
    )
    got = decode_jpeg(data)
    exp = np.clip(_expected_plane_grid(grid, Q_LUM), 0, 255)[:h, :w] / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_jpeg_12bit_precision():
    """12-bit samples where T.81 allows them (SOF1 extended sequential,
    SOF2 progressive): level shift 2048, clamp to 0..4095, normalize by
    4095 — exact recovery; SOF0 at 12-bit stays rejected."""
    rng = np.random.default_rng(28)
    h, w = 16, 16
    grid = _prog_grid(rng, 2, 2)
    grid[..., 0] = rng.integers(-900, 901, size=(2, 2))   # wide DC range
    q12 = np.full(64, 9, dtype=np.int64)
    seq = encode_jpeg([grid.reshape(-1, 64)], h, w, [q12], [(1, 1)],
                      sof_marker=0xC1, prec=12)
    got = decode_jpeg(seq)
    exp = (
        np.clip(_expected_plane_grid(grid, q12) - 128.0 + 2048.0, 0, 4095)
        [:h, :w] / 4095.0
    )
    np.testing.assert_allclose(got, exp, atol=1e-9)
    prog = encode_jpeg_progressive([grid], h, w, [q12], [(1, 1)],
                                   _GRAY_SCRIPT, prec=12)
    np.testing.assert_array_equal(decode_jpeg(prog), got)
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(encode_jpeg([grid.reshape(-1, 64)], h, w, [q12],
                                [(1, 1)], sof_marker=0xC0, prec=12))
