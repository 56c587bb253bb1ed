"""FLAC audio codec — pure stdlib + numpy, implemented from the public
format spec (xiph.org / RFC 9639).  The third fully-real compressed
codec family (after baseline/progressive JPEG and Motion-JPEG/GIF):
real-world audio corpora ship heavily as FLAC, so the audio pipeline's
decode step needs it natively.

Decoder coverage (:func:`decode_flac`): STREAMINFO + metadata-block
walk, frame sync with UTF-8-coded frame/sample numbers, all four
subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32),
Rice/Rice2 residual partitions incl. the escape-to-raw code, wasted
bits, and the three stereo-decorrelation modes (left/side, right/side,
mid/side).  Frame-header CRC-8 and frame CRC-16 are verified (a
mismatch raises ``ValueError`` → the media kernel's corrupt-payload
fallback, never a crash).

Encoder (:func:`encode_flac`): spec-conformant fixture/round-trip
writer — per-subframe best-of (CONSTANT / FIXED order 0-2 with Rice
residuals / VERBATIM fallback), optional mid/side stereo, correct
CRCs — enough to exercise every decoder path the tests pin.  Lossless:
``decode ∘ encode`` is bit-exact on integer PCM.

Reference parity note: the C++ reference has no audio codecs at all —
this module exists for the LLM-data-pipeline side (audio near-dup /
feature extraction over real corpora), same rationale as jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "decode_flac_meta", "encode_flac"]


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over bytes.  ``ones`` (optional) is the
    sorted int64 ndarray of one-bit positions of ``data`` and ``pad8``
    the zero-padded uint8 view of ``data`` — together they power the
    fully vectorized Rice-partition decode (:func:`_decode_rice_vec`)."""

    __slots__ = ("data", "pos", "ones", "pad8")

    def __init__(self, data: bytes, bit_pos: int = 0, ones=None, pad8=None):
        self.data = data
        self.pos = bit_pos          # absolute bit position
        self.ones = ones
        self.pad8 = pad8

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        end_byte = (self.pos + 7) >> 3
        if end_byte > len(self.data):
            raise ValueError("FLAC: bitstream truncated")
        chunk = int.from_bytes(self.data[p >> 3 : end_byte], "big")
        total_bits = (end_byte - (p >> 3)) << 3
        return (chunk >> (total_bits - (p & 7) - n)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
# ---------------------------------------------------------------------------

def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl.append(r & mask)
    return tbl


_CRC8_TBL = _make_crc_table(0x07, 8)
_CRC16_TBL = _make_crc_table(0x8005, 16)
_CRC16_TBL_NP = np.array(_CRC16_TBL, dtype=np.uint16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


def _crc16_shift_tables(levels: int = 26):
    """``(hi, lo)`` uint16[256] pairs per level: advancing a CRC-16
    state ``c`` by ``2**k`` ZERO bytes equals ``hi[k][c>>8] ^
    lo[k][c&0xFF]``.  CRC is linear over GF(2), so the per-byte state
    update is a linear map and its powers compose from split tables
    (the standard crc-combine construction, cf. zlib crc32_combine)."""
    def shift1(c: int) -> int:
        return _CRC16_TBL[(c >> 8) & 0xFF] ^ ((c << 8) & 0xFFFF)

    tbls = [(
        np.array([shift1(b << 8) for b in range(256)], dtype=np.uint16),
        np.array([shift1(b) for b in range(256)], dtype=np.uint16),
    )]
    for _ in range(levels - 1):
        hi, lo = tbls[-1]

        def app(v, hi=hi, lo=lo):
            return hi[v >> 8] ^ lo[v & 0xFF]

        tbls.append((
            app(app(np.arange(256, dtype=np.uint16) << 8)),
            app(app(np.arange(256, dtype=np.uint16))),
        ))
    return tbls


_CRC16_SHIFT = _crc16_shift_tables()


def _crc16_shift_by(c: int, nbytes: int) -> int:
    """Advance CRC-16 state ``c`` by ``nbytes`` zero bytes."""
    k = 0
    while nbytes:
        if nbytes & 1:
            hi, lo = _CRC16_SHIFT[k]
            c = int(hi[c >> 8]) ^ int(lo[c & 0xFF])
        nbytes >>= 1
        k += 1
    return c


def _crc16(data: bytes) -> int:
    c = 0
    if 256 <= len(data) < (1 << 26):
        # (inputs >= 2^26 B — far beyond any spec-conformant frame —
        # would outrun the precomputed shift tables; they take the
        # any-length byte loop below instead of raising)
        # GF(2) segment combine: per-byte leaf CRCs, then log2(n)
        # vectorized pair-combine rounds (crc(A||B) =
        # shift_{|B|}(crc(A)) ^ crc(B)) — ~3x at frame sizes, exact
        # (fuzz-pinned against the byte loop in tests/test_flac.py)
        segs = _CRC16_TBL_NP[np.frombuffer(data, dtype=np.uint8)]
        tail_crc, tail_len, k = 0, 0, 0
        while len(segs) > 1:
            if len(segs) & 1:
                tail_crc = _crc16_shift_by(int(segs[-1]), tail_len) ^ tail_crc
                tail_len += 1 << k
                segs = segs[:-1]
            hi, lo = _CRC16_SHIFT[k]
            left = segs[0::2]
            segs = (hi[left >> 8] ^ lo[left & 0xFF]) ^ segs[1::2]
            k += 1
        c = int(segs[0])
        return _crc16_shift_by(c, tail_len) ^ tail_crc if tail_len else c
    for b in data:
        c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_BLOCKSIZE_TBL = [
    0, 192, 576, 1152, 2304, 4608, -1, -2,      # 6/7: 8/16-bit from header
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
]
_SAMPLERATE_TBL = [
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, -1, -2, -3, None,   # 12/13/14 from header
]
_SAMPLESIZE_TBL = [0, 8, 12, None, 16, 20, 24, 32]


def _read_utf8_number(r: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (up to 36
    bits — one byte beyond standard UTF-8)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


#: FIXED-predictor coefficients by order (spec §9.2.1): prediction of
#: x[i] from previous samples; residual = x - prediction
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _gather_bits(pad8: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Vectorized read of ``width``-bit (<=31) fields at arbitrary
    absolute bit offsets: 6-byte windows gathered from the zero-padded
    stream bytes cover offset(<=7)+width(<=31) <= 38 bits."""
    sb = starts >> 3
    g = pad8[sb[:, None] + np.arange(6)].astype(np.uint64)
    acc = (
        (g[:, 0] << np.uint64(40)) | (g[:, 1] << np.uint64(32))
        | (g[:, 2] << np.uint64(24)) | (g[:, 3] << np.uint64(16))
        | (g[:, 4] << np.uint64(8)) | g[:, 5]
    )
    shift = np.uint64(48) - ((starts & 7).astype(np.uint64) + np.uint64(width))
    return (acc >> shift) & np.uint64((1 << width) - 1)


def _decode_rice_vec(
    r: _BitReader, cnt: int, param: int, out: np.ndarray, idx: int
) -> int:
    """Vectorized Rice(param) partition decode (the residual hot path).

    Each value consumes exactly one terminating one-bit and, for
    ``param>0``, skips at most ``param`` ones (those inside its literal
    field), so the chain of terminators lives within the next
    ``cnt*(1+param)`` entries of the one-bit index: a windowed jump
    table (``searchsorted(win, win+1+param)``) walked in one tight loop
    replaces the per-sample cursor scan; quotients, low bits and the
    zigzag map then compute vectorized.  Bit-identical to the scalar
    walk (fuzz-pinned in tests/test_flac.py); ~3x at the 2048-sample
    clip shape."""
    if cnt <= 0:
        return r.pos
    ones = r.ones
    n_ones = len(ones)
    c0 = r.pos
    step = 1 + param
    i0 = int(np.searchsorted(ones, c0))
    if param:
        hi = min(n_ones, i0 + cnt * step)
        win = ones[i0:hi]
        nwin = hi - i0
        J = np.searchsorted(win, win + step).tolist()
        term = [0] * cnt
        j = 0
        try:
            # any walk past the window raises IndexError here (J values
            # are bounded by nwin and J[nwin] does not exist), which is
            # exactly the out-of-ones truncation case
            for t in range(cnt):
                term[t] = j
                j = J[j]
        except IndexError:
            raise ValueError("FLAC: bitstream truncated") from None
        P = win[term]
    else:
        if i0 + cnt > n_ones:
            raise ValueError("FLAC: bitstream truncated")
        P = ones[i0 : i0 + cnt]
    c_prev = np.empty(cnt, dtype=np.int64)
    c_prev[0] = c0
    if cnt > 1:
        c_prev[1:] = P[:-1] + step
    q = P - c_prev
    new_c = int(P[-1]) + step
    if new_c > len(r.data) * 8:
        raise ValueError("FLAC: bitstream truncated")
    if param:
        low = _gather_bits(r.pad8, P + 1, param)
        u = (q << param) | low.astype(np.int64)
    else:
        u = q
    out[idx : idx + cnt] = (u >> 1) ^ -(u & 1)      # zigzag
    return new_c


def _read_verbatim_vec(
    r: _BitReader, cnt: int, bits: int, out: np.ndarray, idx: int
) -> int:
    """Vectorized escape-partition decode: ``cnt`` consecutive signed
    ``bits``-bit values at the cursor."""
    c0 = r.pos
    if cnt <= 0:
        return c0
    if bits == 0:
        out[idx : idx + cnt] = 0
        return c0
    end = c0 + cnt * bits
    if end > len(r.data) * 8:
        raise ValueError("FLAC: bitstream truncated")
    starts = c0 + np.arange(cnt, dtype=np.int64) * bits
    v = _gather_bits(r.pad8, starts, bits).astype(np.int64)
    s = np.int64(1) << np.int64(bits - 1)
    out[idx : idx + cnt] = (v ^ s) - s          # sign extend
    return end


def _decode_residual(r: _BitReader, n: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    plen = 4 + method          # rice parameter bits (rice=4, rice2=5)
    escape = (1 << plen) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if n % n_parts:
        raise ValueError("FLAC: block size not divisible by partitions")
    out = np.empty(n, dtype=np.int64)
    idx = 0
    for p in range(n_parts):
        cnt = n >> part_order
        if p == 0:
            # a malformed stream can declare order > n >> part_order;
            # the scalar loops ran range(cnt) (zero iterations) — clamp
            # so the vectorized paths keep that exact behavior instead
            # of walking idx backwards
            cnt = max(cnt - order, 0)
        param = r.read(plen)
        if param == escape:
            bits = r.read(5)
            if r.pad8 is not None:
                r.pos = _read_verbatim_vec(r, cnt, bits, out, idx)
                idx += cnt
            else:
                for _ in range(cnt):
                    out[idx] = r.read_signed(bits) if bits else 0
                    idx += 1
        elif r.ones is not None and r.pad8 is not None:
            r.pos = _decode_rice_vec(r, cnt, param, out, idx)
            idx += cnt
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out[idx] = (u >> 1) ^ -(u & 1)      # zigzag
                idx += 1
    return out[:idx]


def _decode_subframe(r: _BitReader, n: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if sf_type == 0:            # CONSTANT
        v = r.read_signed(eff)
        out = np.full(n, v, dtype=np.int64)
    elif sf_type == 1:          # VERBATIM
        out = np.array([r.read_signed(eff) for _ in range(n)], dtype=np.int64)
    elif 8 <= sf_type <= 12:    # FIXED order 0-4
        order = sf_type - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _decode_residual(r, n, order)
        if order == 0:
            out = res.copy()
        else:
            # the FIXED-order-k residual IS the k-th finite difference of
            # the samples, so reconstruction is k iterated cumsums — each
            # seeded with the first element of the (k-1)-th difference of
            # the warmup — instead of a per-sample Python recursion
            warm_arr = np.asarray(warm, dtype=np.int64)
            arr = res
            for o in range(order, 0, -1):
                seed = np.diff(warm_arr, n=o - 1)[0]
                arr = np.concatenate([[seed], arr]).cumsum()
            out = arr
    elif sf_type >= 32:         # LPC order 1-32
        order = sf_type - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {sf_type}")
    if wasted:
        out <<= wasted
    return out


def decode_flac_meta(data: bytes) -> dict:
    """STREAMINFO fields + the bit offset where frames start."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen < 34:
                raise ValueError("FLAC: short STREAMINFO")
            r = _BitReader(body)
            info = {
                "min_block": r.read(16), "max_block": r.read(16),
                "min_frame": r.read(24), "max_frame": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bits_per_sample": r.read(5) + 1,
                "total_samples": r.read(36),
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    info["frame_offset"] = pos
    return info


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ``(samples, sample_rate)``; samples is ``(n,)`` mono
    or ``(n, channels)`` int32 PCM at the stream's bit depth."""
    info = decode_flac_meta(data)
    pos = info["frame_offset"]
    n_ch = info["channels"]
    # per-frame arrays accumulate in lists and concatenate ONCE — a
    # growing per-frame np.concatenate would copy O(frames x samples)
    # on real multi-frame streams
    chan_parts: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    total = info["total_samples"]
    got = 0
    # one-bit index + zero-padded byte view over the whole stream, built
    # once — they power the vectorized Rice/escape partition decodes
    u8 = np.frombuffer(data, dtype=np.uint8)
    ones = np.flatnonzero(np.unpackbits(u8))
    pad8 = np.zeros(len(u8) + 8, dtype=np.uint8)
    pad8[: len(u8)] = u8
    while pos < len(data) and (not total or got < total):
        r = _BitReader(data, pos * 8, ones=ones, pad8=pad8)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit")
        r.read(1)                               # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit 2")
        _read_utf8_number(r)
        bs = _BLOCKSIZE_TBL[bs_code]
        if bs == -1:
            bs = r.read(8) + 1
        elif bs == -2:
            bs = r.read(16) + 1
        elif bs == 0:
            raise ValueError("FLAC: reserved block size")
        sr = _SAMPLERATE_TBL[sr_code]
        if sr == -1:
            sr = r.read(8) * 1000
        elif sr == -2:
            sr = r.read(16)
        elif sr == -3:
            sr = r.read(16) * 10
        elif sr is None:
            raise ValueError("FLAC: invalid sample-rate code")
        elif sr == 0:
            sr = info["sample_rate"]
        bps = _SAMPLESIZE_TBL[ss_code]
        if bps is None:
            raise ValueError("FLAC: reserved sample size")
        if bps == 0:
            bps = info["bits_per_sample"]
        hdr_end = (r.pos + 7) >> 3
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        if _crc8(data[pos : hdr_end]) != r.read(8):
            raise ValueError("FLAC: frame header CRC mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC: frame/stream channel mismatch")
            subs = [_decode_subframe(r, bs, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC: stereo decorrelation on non-stereo")
            # the SIDE channel carries one extra bit
            if ch_code == 8:                    # left/side
                left = _decode_subframe(r, bs, bps)
                side = _decode_subframe(r, bs, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:                  # right/side
                side = _decode_subframe(r, bs, bps + 1)
                right = _decode_subframe(r, bs, bps)
                subs = [right + side, right]
            else:                               # mid/side
                mid = _decode_subframe(r, bs, bps)
                side = _decode_subframe(r, bs, bps + 1)
                left = (2 * mid + (side & 1) + side) >> 1
                subs = [left, left - side]
        else:
            raise ValueError("FLAC: reserved channel assignment")

        r.align()
        crc_end = (r.pos >> 3)
        if _crc16(data[pos:crc_end]) != r.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = r.pos >> 3
        for c in range(n_ch):
            chan_parts[c].append(subs[c])
        got += bs
    chans = [
        np.concatenate(p) if p else np.empty(0, dtype=np.int64)
        for p in chan_parts
    ]
    if total:
        chans = [c[:total] for c in chans]
    out = np.stack(chans, axis=1).astype(np.int32)
    return (out[:, 0] if n_ch == 1 else out), (info["sample_rate"] or 0)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _rice_cost(res: np.ndarray, param: int) -> int:
    u = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(u >> param)) + len(res) * (1 + param)


def _best_rice_param(res: np.ndarray, plen: int = 4) -> int:
    if len(res) == 0:
        return 0
    u = (np.abs(res.astype(np.int64)) << 1) - (res < 0)
    mean = max(float(np.mean(u)), 0.0)
    k = max(0, min((1 << plen) - 2, int(np.log2(mean + 1)) if mean else 0))
    best, best_cost = k, _rice_cost(res, k)
    for cand in (k - 1, k + 1):
        if 0 <= cand <= (1 << plen) - 2:
            c = _rice_cost(res, cand)
            if c < best_cost:
                best, best_cost = cand, c
    return best


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Single-partition Rice coding (partition order 0).

    Bit-identical to per-sample ``write_unary`` + ``write`` calls (a
    Rice code is ``q`` zeros, a 1, then ``param`` low bits — one
    ``(1 << param) | low`` value of width ``q + 1 + param``), but the
    zigzag/quotient/low-bits math is vectorized and the bit packing
    runs inline on the writer's accumulator: one append per sample
    instead of 2+ method calls (the encoder's former hot spot —
    tests/test_flac.py pins round-trips and wire layout)."""
    w.write(0, 2)               # method: rice (4-bit params)
    w.write(0, 4)               # partition order 0
    param = _best_rice_param(res)
    w.write(param, 4)
    r = res.astype(np.int64, copy=False)
    u = (np.abs(r) << 1) - (r < 0)                  # zigzag
    qs = (u >> param).tolist()
    acc, nbits, buf = w.acc, w.nbits, w.buf
    if param:
        one = 1 << param
        lows = (u & (one - 1)).tolist()
        for q, lo in zip(qs, lows):
            acc = (acc << (q + 1 + param)) | one | lo
            nbits += q + 1 + param
            while nbits >= 8:
                nbits -= 8
                buf.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
    else:
        for q in qs:
            acc = (acc << (q + 1)) | 1
            nbits += q + 1
            while nbits >= 8:
                nbits -= 8
                buf.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
    w.acc, w.nbits = acc, nbits


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Best-of CONSTANT / FIXED 0-2 (Rice) / VERBATIM for one channel."""
    n = len(x)
    x = x.astype(np.int64)
    if n and np.all(x == x[0]):
        w.write(0, 1)
        w.write(0, 6)           # CONSTANT
        w.write(0, 1)           # no wasted bits
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # candidate fixed orders: residual magnitude decides
    best_order, best_cost = None, n * bps      # verbatim cost
    residuals = {}
    for order in (0, 1, 2):
        if n <= order:
            continue
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        res = res[: n - order] if order == 0 else res
        residuals[order] = res
        param = _best_rice_param(res)
        cost = order * bps + 2 + 4 + 4 + _rice_cost(res, param)
        if cost < best_cost:
            best_order, best_cost = order, cost
    if best_order is None:
        w.write(0, 1)
        w.write(1, 6)           # VERBATIM
        w.write(0, 1)
        for v in x:
            w.write(int(v) & ((1 << bps) - 1), bps)
        return
    order = best_order
    w.write(0, 1)
    w.write(8 + order, 6)       # FIXED
    w.write(0, 1)
    for v in x[:order]:
        w.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(w, residuals[order])


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    bits_per_sample: int = 16,
    *,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """Integer PCM → FLAC bytes (lossless; ``decode_flac`` round-trips
    bit-exactly).  ``samples``: ``(n,)`` mono or ``(n, ch)``."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    if not (1 <= n_ch <= 8):
        raise ValueError("FLAC: 1-8 channels")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if n and (x.min() < lo or x.max() > hi):
        raise ValueError("FLAC: samples exceed bits_per_sample range")
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16            # md5 unset (all-zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}.get(sample_rate, 0)
    bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits_per_sample]

    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                           # fixed block size strategy
        w.write(7, 4)                           # block size: 16-bit at end
        w.write(sr_code, 4)
        use_ms = mid_side and n_ch == 2
        w.write(10 if use_ms else n_ch - 1, 4)
        w.write(bps_code, 3)
        w.write(0, 1)
        # UTF-8 frame number (frame_no < 2^31 covered below)
        fn = frame_no
        if fn < 0x80:
            w.write(fn, 8)
        elif fn < 0x800:
            w.write(0xC0 | (fn >> 6), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        elif fn < 0x10000:
            w.write(0xE0 | (fn >> 12), 8)
            w.write(0x80 | ((fn >> 6) & 0x3F), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        else:
            w.write(0xF0 | (fn >> 18), 8)
            w.write(0x80 | ((fn >> 12) & 0x3F), 8)
            w.write(0x80 | ((fn >> 6) & 0x3F), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        w.write(bs - 1, 16)
        hdr = w.bytes() if w.nbits == 0 else None
        assert hdr is not None                  # all fields byte-aligned
        hdr_crc = _crc8(hdr)
        w.write(hdr_crc, 8)

        if use_ms:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            mid = (left + right) >> 1
            _encode_subframe(w, mid, bits_per_sample)
            _encode_subframe(w, side, bits_per_sample + 1)
        else:
            for c in range(n_ch):
                _encode_subframe(w, blk[:, c], bits_per_sample)
        w.align()
        frame = w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
