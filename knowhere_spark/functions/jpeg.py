"""Baseline JPEG decoder — pure stdlib + numpy (r7 verdict task #4).

The reference engine has no media layer; this exists for the
training-data pipeline's multimodal operators (operators/multimodal.py),
where "decode the common crawl formats without native deps" is the
contract PNG met in r7 and JPEG meets here.

Scope (ITU-T T.81 baseline sequential DCT, i.e. what cameras and crawl
images overwhelmingly are):

- SOF0 (baseline) and SOF1 (extended sequential, 8-bit) frames;
- Huffman entropy coding with the full DHT parse (any tables, not just
  Annex K), 0xFF00 byte unstuffing, DNL-free scans;
- restart markers (DRI/RSTn) with DC-predictor reset;
- 8-bit DQT tables (16-bit precision accepted too);
- arbitrary sampling factors (4:4:4, 4:2:2, 4:2:0, ...) with
  pixel-replication chroma upsampling;
- interleaved scans (Ns == component count — the shape every baseline
  JFIF encoder emits), and multi-scan non-interleaved sequential
  frames (one scan per component over its REAL block grid);

- progressive DCT (SOF2): multi-scan spectral selection + successive
  approximation (DC/AC first and refinement passes, EOB runs, restart
  markers per scan) over the same Huffman/dequant/IDCT machinery.

12-bit sample precision decodes too where T.81 allows it (SOF1
extended sequential and SOF2 progressive; level shift 2048, range
0..4095 — the medical/DNG shape).  Arithmetic coding (SOF9-11/13-15),
hierarchical (DHP) and lossless (SOF3/7) raise ``NotImplementedError``
— the recognized-but-undecodable contract the multimodal stubs use (an
honest stub, not corrupt data).

Throughput (measured, single core, this container, 256x256 gray,
dense random coefficients — a worst case for code lengths): baseline
~0.75 MiB/s of decoded 8-bit samples, progressive ~0.23 MiB/s (each
refinement scan re-walks the entropy stream).  The Huffman loop is
LUT + canonical-walk accelerated (r9; real images with short codes do
better); dequant + IDCT are vectorized over all blocks (two
tensordots for the whole grid).  The
decode is embarrassingly parallel across images (mapInPandas), so this
is a constant factor, not a scale limit; for production crawls inject
a native decoder via ``decode_payload(..., decoders={"jpeg": fn})``
(operators/multimodal.py) — the designed fast path.

Returns float64 in [0, 1]: ``(h, w)`` for grayscale, ``(h, w, 3)`` RGB
(JFIF full-range BT.601 YCbCr) — the same conventions as the PNG/PNM/BMP
decoders in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag order: zigzag_index -> raster position (T.81 Figure 5)
_ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_SOF_BASELINE = {0xC0, 0xC1}
_SOF_PROGRESSIVE = 0xC2
_SOF_UNSUPPORTED = {
    0xC3: "lossless sequential",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def _idct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C: decode is ``C.T @ F @ C``."""
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    C[0] *= np.sqrt(0.5)
    return C * 0.5


_C = _idct_matrix()


class _HuffTable:
    """Canonical Huffman table from a DHT segment.  Decode is
    LUT-accelerated: an 8-bit peek table resolves every code of length
    ≤ 8 (the overwhelming majority — DC categories and the common AC
    symbols) in one step; longer codes decode by the canonical
    mincode/maxcode walk over a 16-bit peek (T.81 F.16) — O(1) int ops
    per length, no per-bit calls."""

    __slots__ = ("fast", "mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: bytes):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        #: fast[peek8] = (symbol, code_length) for codes ≤ 8 bits
        self.fast: list[tuple[int, int] | None] = [None] * 256
        for ln in range(1, 17):
            nl = bits[ln - 1]
            if nl:
                self.valptr[ln] = k
                self.mincode[ln] = code
                if ln <= 8:
                    for _ in range(nl):
                        base = code << (8 - ln)
                        for p in range(base, base + (1 << (8 - ln))):
                            self.fast[p] = (values[k], ln)
                        code += 1
                        k += 1
                else:
                    code += nl
                    k += nl
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy chunk — a rolling
    integer accumulator refilled bytewise (one shift per multi-bit read
    instead of one per bit)."""

    __slots__ = ("data", "pos", "acc", "nacc")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nacc = 0

    def _fill(self, k: int) -> None:
        data, pos = self.data, self.pos
        n = len(data)
        while self.nacc < k:
            if pos >= n:
                raise ValueError("JPEG entropy data exhausted")
            self.acc = (self.acc << 8) | data[pos]
            pos += 1
            self.nacc += 8
        self.pos = pos

    def read_bit(self) -> int:
        if self.nacc < 1:
            self._fill(1)
        self.nacc -= 1
        v = (self.acc >> self.nacc) & 1
        self.acc &= (1 << self.nacc) - 1   # trim consumed high bits:
        return v                            # the accumulator must not
                                            # grow into a whole-stream
                                            # bigint (O(len) shifts)

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nacc < n:
            self._fill(n)
        self.nacc -= n
        v = (self.acc >> self.nacc) & ((1 << n) - 1)
        self.acc &= (1 << self.nacc) - 1
        return v

    def read_huff(self, table: _HuffTable) -> int:
        # fast path: peek 8 bits (zero-padded near EOF) and resolve
        # short codes in one LUT hit
        if self.nacc < 8:
            data, pos, n = self.data, self.pos, len(self.data)
            while self.nacc < 8 and pos < n:
                self.acc = (self.acc << 8) | data[pos]
                pos += 1
                self.nacc += 8
            self.pos = pos
        if self.nacc >= 8:
            hit = table.fast[(self.acc >> (self.nacc - 8)) & 0xFF]
            if hit is not None:
                self.nacc -= hit[1]
                sym = hit[0]
                self.acc &= (1 << self.nacc) - 1
                return sym
        elif self.nacc > 0:
            hit = table.fast[(self.acc << (8 - self.nacc)) & 0xFF]
            if hit is not None and hit[1] <= self.nacc:
                self.nacc -= hit[1]
                sym = hit[0]
                self.acc &= (1 << self.nacc) - 1
                return sym
        # slow path (codes > 8 bits or truncated tail): the canonical
        # mincode/maxcode walk over a zero-padded 16-bit peek (F.16)
        data, pos, n = self.data, self.pos, len(self.data)
        while self.nacc < 16 and pos < n:
            self.acc = (self.acc << 8) | data[pos]
            pos += 1
            self.nacc += 8
        self.pos = pos
        nacc = self.nacc
        peek = self.acc << (16 - nacc) if nacc < 16 else self.acc >> (nacc - 16)
        maxcode = table.maxcode
        # a full 8-bit fast-path miss already excluded every ln <= 8
        start = 9 if nacc >= 8 else 1
        for ln in range(start, 17):
            code = peek >> (16 - ln)
            if code <= maxcode[ln]:
                if ln > nacc:
                    raise ValueError("JPEG entropy data exhausted")
                self.nacc = nacc - ln
                self.acc &= (1 << self.nacc) - 1
                return table.values[table.valptr[ln] + code - table.mincode[ln]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category sign extension (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    r: _BitReader, dc_tbl: _HuffTable, ac_tbl: _HuffTable, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block of dequant-ready coefficients (zigzag order) + the
    updated DC predictor (T.81 F.2.2: DECODE, RECEIVE, EXTEND).

    The bit-reader state lives in LOCALS for the whole block (~60 Huffman
    symbols + magnitude reads) and is written back once on return: the
    per-symbol ``r.read_huff``/``r.read_bits`` method calls plus their
    attribute loads were ~45% of sequential-scan decode time (profiled
    this round on the bench MJPEG shape; guide §1.2 per-task work —
    semantics are line-for-line those of ``_BitReader.read_huff`` /
    ``read_bits`` / ``_extend``, pinned by the codec round-trip suite)."""
    zz = np.zeros(64, dtype=np.int32)
    data, pos, acc, nacc = r.data, r.pos, r.acc, r.nacc
    n = len(data)
    tbl = dc_tbl
    k = 0                      # 0 → decode DC next; 1..63 → AC loop
    while True:
        # ---- read_huff(tbl), inlined --------------------------------
        if nacc < 8:
            while nacc < 8 and pos < n:
                acc = (acc << 8) | data[pos]
                pos += 1
                nacc += 8
        sym = -1
        if nacc >= 8:
            hit = tbl.fast[(acc >> (nacc - 8)) & 0xFF]
            if hit is not None:
                nacc -= hit[1]
                sym = hit[0]
                acc &= (1 << nacc) - 1
        elif nacc > 0:
            hit = tbl.fast[(acc << (8 - nacc)) & 0xFF]
            if hit is not None and hit[1] <= nacc:
                nacc -= hit[1]
                sym = hit[0]
                acc &= (1 << nacc) - 1
        if sym < 0:
            # slow path: canonical mincode/maxcode walk (F.16)
            while nacc < 16 and pos < n:
                acc = (acc << 8) | data[pos]
                pos += 1
                nacc += 8
            peek = acc << (16 - nacc) if nacc < 16 else acc >> (nacc - 16)
            maxcode = tbl.maxcode
            start = 9 if nacc >= 8 else 1
            for ln in range(start, 17):
                code = peek >> (16 - ln)
                if code <= maxcode[ln]:
                    if ln > nacc:
                        raise ValueError("JPEG entropy data exhausted")
                    nacc -= ln
                    acc &= (1 << nacc) - 1
                    sym = tbl.values[tbl.valptr[ln] + code - tbl.mincode[ln]]
                    break
            else:
                raise ValueError("invalid JPEG Huffman code")
        # ---- dispatch DC / AC ---------------------------------------
        if k == 0:
            t = sym
            if t:
                # read_bits(t) + EXTEND, inlined
                if nacc < t:
                    while nacc < t:
                        if pos >= n:
                            raise ValueError("JPEG entropy data exhausted")
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nacc += 8
                nacc -= t
                v = (acc >> nacc) & ((1 << t) - 1)
                acc &= (1 << nacc) - 1
                pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
            zz[0] = pred
            k = 1
            tbl = ac_tbl
            continue
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:          # ZRL: sixteen zeros
                k += 16
                if k < 64:
                    continue
                break
            break                   # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        # read_bits(size) + EXTEND, inlined
        if nacc < size:
            while nacc < size:
                if pos >= n:
                    raise ValueError("JPEG entropy data exhausted")
                acc = (acc << 8) | data[pos]
                pos += 1
                nacc += 8
        nacc -= size
        v = (acc >> nacc) & ((1 << size) - 1)
        acc &= (1 << nacc) - 1
        zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        k += 1
        if k >= 64:
            break
    r.pos, r.acc, r.nacc = pos, acc, nacc
    return zz, pred


def _split_restarts(data: bytes) -> list[bytes]:
    """Split the entropy-coded segment at RSTn markers and unstuff
    0xFF00 byte sequences in each chunk.

    Iterates 0xFF POSITIONS (C-level ``find``) instead of every byte —
    entropy data is ~1/256 marker bytes, and the former per-byte
    ``bytearray.append`` loop was the #2 decode cost after the block
    loop (profiled this round).  Within a finished chunk every 0xFF is a
    stuffed ``FF 00`` (a non-00/RST successor ENDS the scan, and an RST
    starts a new chunk), so the C-level ``replace(b"\\xff\\x00",
    b"\\xff")`` performs exactly the original unstuffing."""
    chunks: list[bytes] = []
    n = len(data)
    start = 0          # chunk start in `data`
    i = 0              # scan cursor
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            # no marker (or a trailing lone 0xFF, kept as data): the
            # remainder is the final chunk
            chunks.append(data[start:n].replace(b"\xff\x00", b"\xff"))
            return chunks
        m = data[j + 1]
        if m == 0x00:              # stuffed FF — data byte, keep scanning
            i = j + 2
            continue
        if 0xD0 <= m <= 0xD7:      # RSTn: chunk boundary
            chunks.append(data[start:j].replace(b"\xff\x00", b"\xff"))
            start = i = j + 2
            continue
        # any other marker ends the scan (EOI / next segment)
        chunks.append(data[start:j].replace(b"\xff\x00", b"\xff"))
        return chunks


#: pseudo-marker yielded by :func:`_iter_segments_full` for the
#: entropy-coded range following an SOS (body_start..body_end covers it)
_ENTROPY = 0x100


def _iter_segments_full(data: bytes):
    """Yield ``(marker, seg_start, body_start, body_end)`` for every
    marker segment after SOI — THE single JPEG marker walker (shared by
    this decoder, functions/exif and sources/media; three hand-rolled
    copies had already diverged on fill-byte handling).

    Handles T.81 B.1.1.2 fill bytes (any number of 0xFF before a
    marker), standalone markers (TEM/RSTn: ``body_start == body_end``),
    and — unlike the public :func:`iter_jpeg_segments` — RESUMES after
    each SOS, yielding an ``(_ENTROPY, start, start, end)`` sentinel
    covering the entropy-coded range (stuffed 0xFF00 and RSTn included)
    so multi-scan (progressive) streams walk to EOI.  Raises
    ``ValueError`` on malformed structure."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, n = 2, len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while pos + 2 <= n and data[pos + 1] == 0xFF:
            pos += 1   # fill bytes
        if pos + 2 > n:
            # the fill-byte loop can advance pos to the last byte (e.g.
            # a buffer ending in 0xFF fill); reading data[pos + 1] then
            # would IndexError — callers contract on ValueError only
            raise ValueError("JPEG truncated in fill bytes")
        marker = data[pos + 1]
        if marker == 0xD9:                       # EOI
            yield marker, pos, pos + 2, pos + 2
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:   # TEM / RSTn
            yield marker, pos, pos + 2, pos + 2
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("JPEG segment truncated")
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        body_start, body_end = pos + 4, pos + 2 + seg_len
        if seg_len < 2 or body_end > n:
            raise ValueError("JPEG segment length out of range")
        yield marker, pos, body_start, body_end
        pos = body_end
        if marker == 0xDA:                       # SOS: skip entropy data
            e = pos
            while e + 1 < n:
                if data[e] != 0xFF:
                    e += 1
                    continue
                m2 = data[e + 1]
                if m2 == 0x00 or 0xD0 <= m2 <= 0xD7:   # stuffing / RSTn
                    e += 2
                elif m2 == 0xFF:                        # fill byte
                    e += 1
                else:                                   # real marker
                    break
            else:
                e = n                                    # runs to EOF
            yield _ENTROPY, pos, pos, e
            pos = e


def iter_jpeg_segments(data: bytes):
    """Public single-scan walker: like :func:`_iter_segments_full` but
    stops after yielding the first SOS (entropy-coded data follows) or
    EOI — the contract the EXIF scrubber and media sniffers rely on
    (headers only, no entropy scan)."""
    for tup in _iter_segments_full(data):
        if tup[0] == _ENTROPY:
            return
        yield tup
        if tup[0] == 0xDA or tup[0] == 0xD9:
            return


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential or progressive JPEG to float64
    pixels in [0, 1] — ``(h, w)`` grayscale or ``(h, w, 3)`` RGB."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    progressive = False
    restart_interval = 0
    scans: list[dict] = []
    for marker, seg_start, body_start, body_end in _iter_segments_full(data):
        if marker == _ENTROPY:
            if scans:
                scans[-1]["ent"] = (body_start, body_end)
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        body = data[body_start:body_end]
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} (SOF{marker - 0xC0}) not "
                "supported — baseline sequential + progressive only; "
                "inject a decoder via decoders={...}"
            )
        if marker in _SOF_BASELINE or marker == _SOF_PROGRESSIVE:
            progressive = marker == _SOF_PROGRESSIVE
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            # T.81: baseline (SOF0) is 8-bit; extended sequential (SOF1)
            # and progressive (SOF2) also allow 12-bit samples
            if prec != 8 and not (prec == 12 and marker in (0xC1, 0xC2)):
                raise NotImplementedError(
                    f"JPEG {prec}-bit precision (SOF{marker - 0xC0})"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 3 + 3 * c + 3)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps, "prec": prec}
        elif marker == 0xC4:        # DHT
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = body[off + 17 : off + 17 + nv]
                tbl = _HuffTable(bits, vals)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 0x0F] = tbl
                else:
                    huff_ac[tc_th & 0x0F] = tbl
                off += 17 + nv
        elif marker == 0xDB:        # DQT
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4 == 0:
                    q = np.frombuffer(
                        body[off + 1 : off + 65], dtype=np.uint8
                    ).astype(np.int32)
                    off += 65
                else:               # 16-bit table
                    q = np.frombuffer(
                        body[off + 1 : off + 129], dtype=">u2"
                    ).astype(np.int32)
                    off += 129
                slot = pq_tq & 0x0F
                # dequantization runs ONCE in _render over the final qt
                # state, so a (spec-legal) mid-image DQT redefinition
                # would silently decode earlier scans with the wrong
                # table — refuse it like libjpeg does ("Quantization
                # table changed mid-image").  A repeated identical DQT
                # (some encoders re-emit tables per scan) stays fine.
                if scans and slot in qt and not np.array_equal(qt[slot], q):
                    raise ValueError(
                        "JPEG quantization table redefined after SOS"
                    )
                qt[slot] = q
        elif marker == 0xDD:        # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = []
            for s in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * s)
                sel.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            ss, se, ahal = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            scans.append(
                {
                    "sel": sel,
                    "ss": ss, "se": se, "ah": ahal >> 4, "al": ahal & 0x0F,
                    # tables/DRI are snapshotted at SOS time: progressive
                    # streams redefine DHT between scans
                    "dc": dict(huff_dc), "ac": dict(huff_ac),
                    "dri": restart_interval,
                    "ent": (body_end, body_end),
                }
            )
        # APPn / COM / others: skipped
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — one
        # data unit per MCU in raster order, whatever the declared
        # sampling factors say (they are ratios, meaningless alone);
        # honoring e.g. 2x2 here would permute the blocks
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # zigzag-order coefficient grid per component, MCU-padded
    coefs = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }
    if progressive:
        for scan in scans:
            _decode_progressive_scan(
                data, scan, frame, coefs, hmax, vmax, mcux, mcuy
            )
    else:
        for scan in scans:
            _decode_sequential_scan(
                data, scan, frame, coefs, hmax, vmax, mcux, mcuy
            )
    return _render(frame, coefs, qt, hmax, vmax)


def _scan_tables(scan: dict, s: dict) -> tuple[_HuffTable, _HuffTable]:
    try:
        return scan["dc"][s["td"]], scan["ac"][s["ta"]]
    except KeyError:
        raise ValueError("JPEG scan references an undefined Huffman table")


def _decode_sequential_scan(
    data: bytes, scan: dict, frame: dict, coefs: dict,
    hmax: int, vmax: int, mcux: int, mcuy: int,
) -> None:
    """One sequential scan → fill its components' coefficient grids
    (T.81 F.2).  Interleaved scans (Ns == frame components, or any
    subset > 1) walk full frame-level MCUs; a single-component scan in
    a multi-component frame is NON-interleaved — one block per MCU in
    raster order over the component's REAL grid (T.81 A.2.2), the
    multi-scan layout some sequential encoders emit per component."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    sel = scan["sel"]
    chunks = _split_restarts(data[scan["ent"][0] : scan["ent"][1]])
    if len(sel) == 1 and len(comps) > 1:
        c = by_id[sel[0]["cs"]]
        dtbl, atbl = _scan_tables(scan, sel[0])
        bh, bw = _comp_blocks(frame, c, hmax, vmax)
        grid = coefs[c["id"]]
        units = bh * bw
        per_chunk = scan["dri"] if scan["dri"] else units
        unit = 0
        for chunk in chunks:
            if unit >= units:
                break
            r = _BitReader(chunk)
            pred = 0                          # RSTn resets the predictor
            for _ in range(min(per_chunk, units - unit)):
                zz, pred = _decode_block(r, dtbl, atbl, pred)
                grid[divmod(unit, bw)] = zz
                unit += 1
        if unit < units:
            raise ValueError("JPEG truncated entropy data")
        return
    order = []                       # (comp, dc_tbl, ac_tbl) per block slot
    for s in sel:
        c = by_id[s["cs"]]
        order.append((c, *_scan_tables(scan, s)))
    mcu_total = mcux * mcuy
    per_chunk = scan["dri"] if scan["dri"] else mcu_total
    mcu = 0
    for chunk in chunks:
        if mcu >= mcu_total:
            break
        r = _BitReader(chunk)
        preds = {c["id"]: 0 for c in comps}   # RSTn resets DC predictors
        for _ in range(min(per_chunk, mcu_total - mcu)):
            my, mx = divmod(mcu, mcux)
            for c, dtbl, atbl in order:
                for vy in range(c["v"]):
                    for hx in range(c["h"]):
                        zz, preds[c["id"]] = _decode_block(
                            r, dtbl, atbl, preds[c["id"]]
                        )
                        coefs[c["id"]][my * c["v"] + vy, mx * c["h"] + hx] = zz
            mcu += 1
    if mcu < mcu_total:
        raise ValueError("JPEG truncated entropy data")


def _comp_blocks(frame: dict, c: dict, hmax: int, vmax: int) -> tuple[int, int]:
    """A component's REAL block grid (ceil of its subsampled dims / 8) —
    non-interleaved scans cover exactly these blocks, NOT the MCU-padded
    grid (T.81 A.2.2: dummy blocks exist only in interleaved scans)."""
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    data: bytes, scan: dict, frame: dict, coefs: dict,
    hmax: int, vmax: int, mcux: int, mcuy: int,
) -> None:
    """One progressive scan: DC or AC band, first pass or successive-
    approximation refinement (T.81 G.2, the jdphuff algorithms
    re-derived from the spec)."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    sel = scan["sel"]
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive scan mixes DC and AC")
    if ss > 0 and len(sel) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    chunks = _split_restarts(data[scan["ent"][0] : scan["ent"][1]])

    if len(sel) == 1:
        # non-interleaved: one block per MCU, raster over the REAL grid
        s0 = sel[0]
        c = by_id[s0["cs"]]
        bh, bw = _comp_blocks(frame, c, hmax, vmax)
        grid = coefs[c["id"]]
        units = bh * bw
        per_chunk = scan["dri"] if scan["dri"] else units
        dtbl = scan["dc"].get(s0["td"]) if ss == 0 and ah == 0 else None
        atbl = scan["ac"].get(s0["ta"]) if ss > 0 else None
        if ss == 0 and ah == 0 and dtbl is None:
            raise ValueError("JPEG progressive DC scan missing DC table")
        if ss > 0 and atbl is None:
            raise ValueError("JPEG progressive AC scan missing AC table")
        unit = 0
        for chunk in chunks:
            if unit >= units:
                break
            r = _BitReader(chunk)
            pred = 0
            eobrun = 0
            for _ in range(min(per_chunk, units - unit)):
                zz = grid[divmod(unit, bw)]
                if ss == 0:
                    pred = _dc_progressive(r, dtbl, zz, ah, al, pred)
                elif ah == 0:
                    eobrun = _ac_first(r, atbl, zz, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(r, atbl, zz, ss, se, al, eobrun)
                unit += 1
        if unit < units:
            raise ValueError("JPEG truncated progressive scan")
        return

    # interleaved DC scan (first or refinement) over full MCUs
    order = []
    for s in sel:
        c = by_id[s["cs"]]
        dtbl = scan["dc"].get(s["td"]) if ah == 0 else None
        if ah == 0 and dtbl is None:
            raise ValueError("JPEG progressive DC scan missing DC table")
        order.append((c, dtbl))
    mcu_total = mcux * mcuy
    per_chunk = scan["dri"] if scan["dri"] else mcu_total
    mcu = 0
    for chunk in chunks:
        if mcu >= mcu_total:
            break
        r = _BitReader(chunk)
        preds = {c["id"]: 0 for c, _ in order}
        for _ in range(min(per_chunk, mcu_total - mcu)):
            my, mx = divmod(mcu, mcux)
            for c, dtbl in order:
                for vy in range(c["v"]):
                    for hx in range(c["h"]):
                        zz = coefs[c["id"]][my * c["v"] + vy, mx * c["h"] + hx]
                        preds[c["id"]] = _dc_progressive(
                            r, dtbl, zz, ah, al, preds[c["id"]]
                        )
            mcu += 1
    if mcu < mcu_total:
        raise ValueError("JPEG truncated progressive scan")


def _dc_progressive(
    r: _BitReader, dtbl: _HuffTable | None, zz: np.ndarray,
    ah: int, al: int, pred: int,
) -> int:
    """DC coefficient, first pass (Huffman diff, scaled by 2^Al) or
    refinement (one raw bit ORed into bit Al)."""
    if ah == 0:
        t = r.read_huff(dtbl)
        diff = _extend(r.read_bits(t), t) if t else 0
        pred += diff
        zz[0] = pred << al
    else:
        if r.read_bit():
            zz[0] = int(zz[0]) | (1 << al)
    return pred


def _ac_first(
    r: _BitReader, atbl: _HuffTable, zz: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """AC band, first pass: run-length + EOB-run coding (T.81 G.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.read_huff(atbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:           # EOBn: 2^run + appended bits blocks
                eobrun = 1 << run
                if run:
                    eobrun += r.read_bits(run)
                return eobrun - 1   # this block is the first of the run
            k += 16                 # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("JPEG AC run overflows spectral band")
        zz[k] = _extend(r.read_bits(size), size) << al
        k += 1
    return 0


def _ac_refine(
    r: _BitReader, atbl: _HuffTable, zz: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """AC band, successive-approximation refinement: correction bits
    for history-nonzero coefficients, new ±2^Al coefficients elsewhere
    (T.81 G.2.2 / the jdphuff refinement algorithm)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.read_huff(atbl)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if run != 15:       # EOBn — current block still needs
                    eobrun = 1 << run               # its correction tail
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # ZRL: skip 16 history-zero coefficients, no new coef
            else:
                if size != 1:
                    raise ValueError("JPEG AC refinement size must be 1")
                newval = p1 if r.read_bit() else m1
            # advance over `run` history-zero coefficients, emitting
            # correction bits for every history-nonzero one passed
            while k <= se:
                if zz[k] != 0:
                    if r.read_bit() and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        # correction bits for the remaining history-nonzero coefficients
        while k <= se:
            if zz[k] != 0:
                if r.read_bit() and (int(zz[k]) & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _render(
    frame: dict, coefs: dict, qt: dict, hmax: int, vmax: int
) -> np.ndarray:
    """Dequantize + IDCT every block (vectorized over the whole grid —
    two tensordots instead of per-block 8x8 matmuls), upsample chroma,
    color-transform.  Shared by the baseline and progressive paths."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    # sample range per precision: level shift 2^(P-1), clamp to 2^P - 1
    shift = 1 << (frame.get("prec", 8) - 1)
    maxv = (1 << frame.get("prec", 8)) - 1
    out_planes = []
    for c in comps:
        zz = coefs[c["id"]]                       # (by, bx, 64) zigzag
        q = qt[c["tq"]]
        nat = np.zeros(zz.shape, dtype=np.float64)
        # int64 product: coefficient x 16-bit quant values sit near the
        # int32 edge on adversarial streams — never wrap silently
        nat[..., _ZIGZAG] = zz.astype(np.int64) * q   # dequant + de-zigzag
        by, bx = zz.shape[:2]
        f = nat.reshape(by, bx, 8, 8)
        # px = C.T @ F @ C per block
        px = np.tensordot(
            np.tensordot(f, _C, axes=([2], [0])), _C, axes=([2], [0])
        )                                          # (by, bx, 8, 8)
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # per-plane clamp to the 8-bit sample range BEFORE the color
        # transform — libjpeg's range-limit semantics (out-of-gamut IDCT
        # excursions saturate as samples, not as RGB)
        p = np.clip(plane + float(shift), 0, maxv)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:        # pixel-replication chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0] / float(maxv)
    if len(out_planes) != 3:
        raise NotImplementedError(f"JPEG with {len(out_planes)} components")
    y, cb, cr = out_planes
    cb = cb - float(shift)
    cr = cr - float(shift)
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(rgb, 0, maxv) / float(maxv)


# ---------------------------------------------------------------------------
# Baseline encoder (grayscale) — the library's forward path.
#
# The decoder above exists because a curation pipeline must READ crawl
# JPEGs; this minimal encoder exists because the pipeline sometimes has to
# WRITE them — MJPEG video fixtures (MP4 `jpeg`-fourcc sample entries whose
# payloads are real baseline JPEGs, the second fully-real video codec path
# after animated GIF), thumbnail re-encode stubs, round-trip tests.  One
# component, baseline sequential, T.81 Annex K luminance Huffman tables
# (public spec constants), flat default quant table.  Deterministic:
# identical pixels → identical bytes.
# ---------------------------------------------------------------------------

_ENC_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_ENC_DC_VALS = tuple(range(12))
_ENC_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_ENC_AC_VALS = (
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
)


def _enc_codes(bits, vals):
    out = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


#: powers of two for a vectorized ``int.bit_length`` (JPEG magnitude
#: category): ``searchsorted(_ENC_POW2, |v|, side="right")``.  Baseline
#: categories never exceed 16 bits; 32 entries is comfortably past any
#: value the quantizer can emit.
_ENC_POW2 = 1 << np.arange(32, dtype=np.int64)


def _enc_scan(zz: np.ndarray, dc_codes, ac_codes) -> bytes:
    """Entropy-code zigzag blocks ``zz`` (n, 64) into the scan's stuffed
    byte stream.

    Bit-identical to the per-symbol ``_BitWriter`` loop it replaced
    (same Annex K codes, same symbol order, same 1-bit padding, same
    F.1.2.3 stuffing — pinned by tests/test_multimodal.py's reference-
    writer comparison), ~3× faster: magnitude categories, extra-bits
    values and zero runs are vectorized per image, each symbol appends
    huffcode‖extra-bits as ONE shift into an int accumulator flushed a
    byte at a time, and 0xFF stuffing is a single ``replace`` over the
    raw scan (every raw 0xFF is a stuffed pair by F.1.2.3)."""
    nblk = len(zz)
    # DC: the prediction chain is a lag-1 difference across blocks
    dcs = zz[:, 0]
    diffs = dcs.copy()
    diffs[1:] -= dcs[:-1]
    dc_cat = np.searchsorted(_ENC_POW2, np.abs(diffs), side="right")
    dc_ext = np.where(diffs >= 0, diffs, diffs + (1 << dc_cat) - 1)
    # AC: per-image nonzero scan; k/run/category/extra-bits all batch
    rows, cols = np.nonzero(zz[:, 1:])
    ks = cols + 1                       # zigzag position within block
    vals = zz[rows, ks]
    ac_cat = np.searchsorted(_ENC_POW2, np.abs(vals), side="right")
    ac_ext = np.where(vals >= 0, vals, vals + (1 << ac_cat) - 1)
    runs = np.empty(len(ks), dtype=np.int64)
    if len(ks):
        runs[:] = ks - 1
        same_blk = rows[1:] == rows[:-1]
        runs[1:][same_blk] = (ks[1:] - ks[:-1] - 1)[same_blk]
    # per-block slice bounds into the flat nonzero arrays
    bounds = np.searchsorted(rows, np.arange(nblk + 1))
    zrl_code, zrl_ln = ac_codes[0xF0]
    eob_code, eob_ln = ac_codes[0x00]
    buf = bytearray()
    acc, nbits = 0, 0
    dc_cat_l = dc_cat.tolist()
    dc_ext_l = dc_ext.tolist()
    ac_cat_l = ac_cat.tolist()
    ac_ext_l = ac_ext.tolist()
    runs_l = runs.tolist()
    ks_l = ks.tolist()
    for b in range(nblk):
        t = dc_cat_l[b]
        code, ln = dc_codes[t]
        # huffcode ‖ extra-bits in one append (t = 0 appends nothing)
        acc = (acc << (ln + t)) | (code << t) | dc_ext_l[b]
        nbits += ln + t
        while nbits >= 8:
            nbits -= 8
            buf.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1
        lo, hi = bounds[b], bounds[b + 1]
        for i in range(lo, hi):
            run = runs_l[i]
            while run > 15:
                acc = (acc << zrl_ln) | zrl_code
                nbits += zrl_ln
                run -= 16
            s = ac_cat_l[i]
            code, ln = ac_codes[(run << 4) | s]
            acc = (acc << (ln + s)) | (code << s) | ac_ext_l[i]
            nbits += ln + s
            while nbits >= 8:
                nbits -= 8
                buf.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
        if hi == lo or ks_l[hi - 1] < 63:
            acc = (acc << eob_ln) | eob_code
            nbits += eob_ln
            while nbits >= 8:
                nbits -= 8
                buf.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
    if nbits:
        pad = 8 - nbits
        buf.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(buf).replace(b"\xff", b"\xff\x00")


#: flat default quant step — mild loss, deterministic; pass your own
#: 64-entry zigzag-ordered table for JFIF-style quality curves
_ENC_Q_DEFAULT = 8


def encode_jpeg_gray(pixels: np.ndarray, q_table: np.ndarray | None = None) -> bytes:
    """Encode an 8-bit grayscale image as a REAL baseline JPEG.

    ``pixels``: (h, w) array, values 0-255 (uint8 or float, clipped).
    ``q_table``: 64 zigzag-ordered quant steps (default: flat 8).  The
    output round-trips through this module's own :func:`decode_jpeg`
    within quantization error (pytest-pinned), and any standard decoder
    reads it — SOI / DQT / SOF0 / DHT (Annex K luminance) / SOS / EOI.
    """
    import struct

    px = np.clip(np.asarray(pixels, dtype=np.float64), 0, 255)
    if px.ndim != 2:
        raise ValueError("encode_jpeg_gray takes a single (h, w) plane")
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = (
        np.full(64, _ENC_Q_DEFAULT, dtype=np.int64)
        if q_table is None
        else np.asarray(q_table, dtype=np.int64).reshape(64)
    )
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quant steps must be in [1, 255]")
    by, bx = -(-h // 8), -(-w // 8)
    # edge-replicate padding: blocks beyond the image carry real samples
    pad = np.pad(px, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    blocks = (
        pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    # forward DCT with the decoder's own basis (px = C.T @ F @ C  ⇒
    # F = C @ px @ C.T) — one matmul pair over all blocks
    F_ = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    zz = np.rint(F_.reshape(-1, 64)[:, _ZIGZAG] / q[None, :]).astype(np.int64)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    out += seg(0xC4, dht)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    out += _enc_scan(zz, dc_codes, ac_codes)
    out += b"\xff\xd9"
    return bytes(out)
