"""IMA / MS ADPCM (functions/adpcm.py) — hand-computed spec vectors,
an INDEPENDENT cross-validation of the IMA recurrence against the
stdlib ``audioop`` implementation (same reference algorithm, different
authors — no mirror risk), encoder round-trip bounds, and the WAV
container path end to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from knowhere_spark.functions.adpcm import (
    decode_ima_blocks,
    decode_ms_blocks,
    encode_ima_blocks,
    encode_ms_blocks,
    ima_samples_per_block,
    ms_samples_per_block,
)


def _ima_block(pred: int, index: int, nibbles: list[int], block_align: int) -> bytes:
    """Pack one mono IMA block: header + low-nibble-first data bytes."""
    n_data = (block_align - 4) * 2
    nibs = (nibbles + [0] * n_data)[:n_data]
    body = bytearray(struct.pack("<hBB", pred, index, 0))
    for k in range(0, n_data, 2):
        body.append(nibs[k] | (nibs[k + 1] << 4))
    return bytes(body)


def test_ima_hand_vector():
    """First steps computed by hand from the reference algorithm:
    pred=0 idx=0 step=7; nib 4 → +7 (idx→2, step 9); nib 12 → −10."""
    blk = _ima_block(0, 0, [4, 12], block_align=12)
    out = decode_ima_blocks(blk, 12, 1)[:, 0]
    assert out[0] == 0 and out[1] == 7 and out[2] == -3


def test_ima_matches_audioop_reference():
    """Decode audioop's IMA nibble stream (high-nibble-first bytes,
    repacked low-first for the WAV layout) with our recurrence from the
    same (0, 0) initial state — outputs must be identical."""
    audioop = pytest.importorskip("audioop")
    rng = np.random.default_rng(3)
    n = 256                                     # nibbles per test block
    pcm = (3000 * np.sin(np.arange(n) * 0.13)
           + rng.integers(-400, 400, n)).astype("<i2")
    adpcm, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
    want = np.frombuffer(audioop.adpcm2lin(adpcm, 2, None)[0], dtype="<i2")
    # audioop packs sample k even → HIGH nibble; WAV wants low first
    nibs = []
    for b in adpcm:
        nibs += [b >> 4, b & 0x0F]
    block_align = 4 + len(nibs) // 2
    blk = _ima_block(0, 0, nibs, block_align)
    got = decode_ima_blocks(blk, block_align, 1)[1 : n + 1, 0]
    assert np.array_equal(got, want.astype(np.int64))


def test_ima_encode_decode_roundtrip_bound():
    """ADPCM is lossy; the reference quantizer's error is bounded by
    the current step size.  A smooth signal reconstructs closely and
    the first sample of every block is exact (stored raw)."""
    t = np.arange(4096)
    x = (8000 * np.sin(t * 0.01)).astype(np.int64)
    ba = 256
    raw = encode_ima_blocks(x, block_align=ba)
    y = decode_ima_blocks(raw, ba, 1)[: len(x), 0]
    spb = ima_samples_per_block(ba, 1)
    assert np.array_equal(y[::spb], x[::spb])   # block headers exact
    assert np.abs(y - x).mean() < 40
    assert np.abs(y - x).max() < 2000           # step-bounded, no blowup


def test_ima_stereo_group_interleave():
    """Stereo: 4-byte groups alternate channels; constant-per-channel
    signals must come back constant per channel (no cross-talk)."""
    n = 2 * (ima_samples_per_block(72, 2))
    x = np.stack([np.full(n, 1000), np.full(n, -2000)], axis=1)
    raw = encode_ima_blocks(x, block_align=72)
    y = decode_ima_blocks(raw, 72, 2)[:n]
    assert np.array_equal(y[:, 0], x[:, 0])
    assert np.array_equal(y[:, 1], x[:, 1])


def test_ms_hand_vector():
    """coef pair 0 (256, 0), delta 16, s1=100, s2=50: nibble +1 →
    (100·256)>>8 + 16 = 116; nibble −1 (0xF) → 116 − 16 = 100."""
    body = bytearray([0])                        # predictor index
    body += struct.pack("<hhh", 16, 100, 50)     # delta, s1, s2
    body += bytes([(1 << 4) | 0x0F])             # nibbles +1, −1
    out = decode_ms_blocks(bytes(body), 8, 1)[:, 0]
    assert list(out) == [50, 100, 116, 100]


def test_ms_encode_decode_roundtrip_bound():
    t = np.arange(4096)
    x = (8000 * np.sin(t * 0.01)).astype(np.int64)
    ba = 256
    raw = encode_ms_blocks(x, block_align=ba)
    y = decode_ms_blocks(raw, ba, 1)[: len(x), 0]
    spb = ms_samples_per_block(ba, 1)
    # both header samples of every block are stored raw
    assert np.array_equal(y[::spb], x[::spb])
    assert np.array_equal(y[1::spb], x[1::spb])
    assert np.abs(y - x).mean() < 40
    assert np.abs(y - x).max() < 2000


def _wav(fmt_tag: int, nch: int, block_align: int, data: bytes,
         fact: int | None = None, bits: int = 4) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, nch, 8000,
                      8000 * block_align // 256, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.mark.parametrize("tag", [0x11, 0x02])
def test_adpcm_wav_through_decode_payload(tag):
    """The media kernel decodes ADPCM WAVs end to end (fmt tags 0x11 /
    0x02), honoring the fact chunk's true sample count."""
    from knowhere_spark.operators.multimodal import decode_payload, sniff_format

    t = np.arange(3000)
    x = (6000 * np.sin(t * 0.02)).astype(np.int64)
    ba = 256
    if tag == 0x11:
        raw = encode_ima_blocks(x, block_align=ba)
    else:
        raw = encode_ms_blocks(x, block_align=ba)
    wav = _wav(tag, 1, ba, raw, fact=len(x))
    assert sniff_format(wav) == "wav"
    got = decode_payload(wav, "audio", {})
    assert got.shape == (len(x),)                # fact trim applied
    assert np.abs(got - x / 32768.0).max() < 0.1


def test_adpcm_misalignment_raises():
    with pytest.raises(ValueError):
        decode_ima_blocks(b"\x00" * 30, 10, 1)   # data not 4-byte groups
    with pytest.raises(ValueError):
        decode_ima_blocks(b"\x00" * 8, 4, 1)     # header-only block
    with pytest.raises(ValueError):
        decode_ms_blocks(b"\x00" * 7, 7, 1)
