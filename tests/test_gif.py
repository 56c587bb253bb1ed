"""GIF decoder tests (functions/gif.py) — exact recovery against
payloads built by a minimal in-test encoder, plus hand-packed streams
for the LZW table-growth, interlace, transparency and disposal paths.

The encoder uses the clear-code-per-pixel trick: emitting a clear code
before every pixel code keeps the code width fixed at
``min_code_size + 1`` bits — a perfectly valid (just incompressible)
GIF stream, so the decoder's table/width logic is exercised separately
by the hand-packed growth test below.
"""

import struct

import numpy as np
import pytest

from knowhere_spark.functions.gif import (
    _lzw_decode,
    decode_gif,
    decode_gif_frames,
)
from knowhere_spark.operators.multimodal import decode_payload, sniff_format


class _Bits:
    """LSB-first bit packer (GIF packs LZW codes little-endian)."""

    def __init__(self):
        self.buf = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code: int, width: int):
        self.buf |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.buf & 0xFF)
            self.buf, self.n = 0, 0
        return bytes(self.out)


def _lzw_encode_naive(indices, min_code_size: int) -> bytes:
    """Clear code before every literal → fixed-width valid LZW."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = _Bits()
    width = min_code_size + 1
    bits.put(clear, width)
    for i in indices:
        bits.put(int(i), width)
        bits.put(clear, width)
    bits.put(end, width)
    return bits.bytes()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames,
    palette,
    *,
    interlace: bool = False,
    controls=None,
    version: bytes = b"GIF89a",
) -> bytes:
    """Minimal GIF encoder for tests: one global palette, full-screen
    frames.  ``controls``: optional per-frame (disposal, transparent_idx
    or None, delay_cs) Graphic Control Extensions."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1  # table size = 2^(f+1)
    table_n = 2 << size_field
    min_code = max(2, size_field + 1)
    out = bytearray()
    out += version
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    for i in range(table_n):
        out += bytes(palette[i]) if i < n else b"\x00\x00\x00"
    for fi, fr in enumerate(frames):
        if controls and controls[fi] is not None:
            disposal, tidx, delay = controls[fi]
            gflags = (disposal & 7) << 2 | (1 if tidx is not None else 0)
            out += b"\x21\xf9\x04"
            out += struct.pack("<BHB", gflags, delay, tidx or 0)
            out += b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = fr
        if interlace:
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, h, step))
            idx = fr[order]
        out.append(min_code)
        out += _subblocks(_lzw_encode_naive(idx.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


PALETTE4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def _rand_frame(rng, h, w, n_colors):
    return rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)


def test_gif_single_frame_exact():
    rng = np.random.default_rng(7)
    fr = _rand_frame(rng, 11, 17, 4)
    data = encode_gif([fr], PALETTE4)
    assert sniff_format(data) == "gif"
    arr = decode_gif(data)
    expect = np.array(PALETTE4, dtype=np.float64)[fr] / 255.0
    np.testing.assert_allclose(arr, expect)


def test_gif_interlaced_exact():
    rng = np.random.default_rng(8)
    fr = _rand_frame(rng, 13, 9, 4)
    plain = decode_gif(encode_gif([fr], PALETTE4))
    inter = decode_gif(encode_gif([fr], PALETTE4, interlace=True))
    np.testing.assert_allclose(inter, plain)


def test_gif_lzw_table_growth_roundtrip():
    """A real compressing stream: encode a run-heavy raster with a
    textbook LZW encoder (table growth, width bumps, 12-bit cap via a
    long input) and check the decoder inverts it exactly."""
    rng = np.random.default_rng(9)
    # long runs → the table actually grows; 6000 px pushes several width bumps
    raster = np.repeat(rng.integers(0, 4, 600), 10).astype(np.uint8)
    min_code = 2
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    bits = _Bits()
    bits.put(clear, width)
    cur = b""
    for b in raster.tobytes():
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        bits.put(table[cur], width)
        if next_code < 4096:
            # giflib's exact sequence: bump AFTER writing the current
            # code / BEFORE inserting the new entry, when the pre-insert
            # next-code counter hits 2^width — this matches the
            # decoder's post-append table size exactly
            if next_code >= (1 << width) and width < 12:
                width += 1
            table[nxt] = next_code
            next_code += 1
        cur = bytes([b])
    bits.put(table[cur], width)
    bits.put(end, width)
    decoded = _lzw_decode(min_code, bits.bytes(), len(raster))
    assert decoded == raster.tobytes()


def test_gif_animation_disposal_and_transparency():
    h, w = 6, 6
    f0 = np.zeros((h, w), np.uint8)
    f0[:] = 1                      # all red
    f1 = np.full((h, w), 2, np.uint8)   # all green, but transparent idx 2
    f2 = np.full((h, w), 3, np.uint8)   # all blue
    data = encode_gif(
        [f0, f1, f2],
        PALETTE4,
        controls=[
            (3, None, 2),   # f0: restore-to-previous after display
            (0, 2, 2),      # f1: idx 2 transparent → shows f0's canvas... but
            (2, None, 2),   # f2: restore-to-background after display
        ],
    )
    frames, delays = decode_gif_frames(data)
    assert frames.shape == (3, h, w, 3)
    red = np.array([1.0, 0.0, 0.0])
    blue = np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(frames[0], np.broadcast_to(red, (h, w, 3)))
    # f0 disposed with restore-to-previous → canvas back to black;
    # f1 is fully transparent → frame 1 shows the black canvas
    np.testing.assert_allclose(frames[1], np.zeros((h, w, 3)))
    np.testing.assert_allclose(frames[2], np.broadcast_to(blue, (h, w, 3)))
    assert delays == [0.02, 0.02, 0.02]


def test_gif_subrect_frame_compositing():
    """Second frame paints only a 2x2 rect inside the 4x4 screen."""
    base = np.full((4, 4), 1, np.uint8)
    data = bytearray(encode_gif([base], PALETTE4))
    # append a 2x2 frame at (1,1) painting green, then new trailer
    del data[-1:]
    patch = np.full((2, 2), 2, np.uint8)
    data += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    data.append(2)
    data += _subblocks(_lzw_encode_naive(patch.reshape(-1), 2))
    data += b"\x3b"
    frames, _ = decode_gif_frames(bytes(data))
    assert frames.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(frames[1][0, 0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(frames[1][1, 1], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(frames[1][2, 2], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(frames[1][3, 3], [1.0, 0.0, 0.0])


def test_gif_through_decode_payload():
    rng = np.random.default_rng(10)
    fr = _rand_frame(rng, 8, 8, 4)
    data = encode_gif([fr], PALETTE4)
    meta = {"width": 8, "height": 8, "n_frames": 1, "sample_rate": 16000}
    arr = decode_payload(data, "image", meta)
    expect = np.array(PALETTE4, dtype=np.float64)[fr] / 255.0
    np.testing.assert_allclose(arr, expect)
    # animated GIF in a video row → full frame stack
    anim = encode_gif([fr, 3 - fr], PALETTE4)
    vid = decode_payload(anim, "video", dict(meta, n_frames=2))
    assert vid.shape == (2, 8, 8, 3)


def test_gif_corrupt_falls_back_to_fake():
    bad = b"GIF89a" + b"\x00" * 4   # truncated screen descriptor
    meta = {"width": 5, "height": 5, "n_frames": 1, "sample_rate": 16000}
    arr = decode_payload(bad, "image", meta)
    assert arr.shape == (5, 5, 3)   # deterministic fake, shape from meta
    with pytest.raises(ValueError):
        decode_gif(bad)


def test_gif87a_and_unknown_block_rejected():
    rng = np.random.default_rng(11)
    fr = _rand_frame(rng, 5, 5, 4)
    ok = encode_gif([fr], PALETTE4, version=b"GIF87a")
    assert decode_gif(ok).shape == (5, 5, 3)
    bad = bytearray(ok)
    bad[13 + 4 * 3] = 0x7F   # clobber the image-descriptor introducer
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_gif_decodes_real_encoder_files():
    """Regression against REAL encoder output: the stdlib ships GIF
    icons (idlelib) written by production encoders with genuinely
    compressing LZW streams — the width-bump timing that hand-built
    streams can get subtly wrong (and this decoder's first cut did).
    Skipped if the interpreter has no idlelib icons."""
    import glob
    import struct
    import sysconfig

    icons = sorted(
        glob.glob(sysconfig.get_path("stdlib") + "/idlelib/Icons/*.gif")
    )
    if not icons:
        pytest.skip("no idlelib GIF icons in this interpreter")
    assert len(icons) >= 3
    for path in icons:
        data = open(path, "rb").read()
        w, h = struct.unpack_from("<HH", data, 6)
        frames, _ = decode_gif_frames(data)
        assert frames.shape[1:] == (h, w, 3)
        assert 0.0 <= frames.min() and frames.max() <= 1.0
        assert frames.std() > 0   # real icons aren't flat
