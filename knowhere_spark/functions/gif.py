"""GIF decoder — pure stdlib + numpy (no PIL in this environment).

The reference engine has no media layer; like functions/jpeg.py this
exists for the training-data pipeline's multimodal operators
(operators/multimodal.py), where the contract is "decode the common
crawl formats without native deps" — PNG (r7), JPEG (r8), GIF here.

Scope (GIF87a / GIF89a, the full static + animated format):

- LZW decompression (variable 3..12-bit codes, LSB-first packing,
  clear / end-of-information codes, deferred-clear streams);
- global and per-frame local color tables;
- interlaced frames (the 8/8/4/2 four-pass row order);
- GIF89a Graphic Control Extensions: transparency and disposal
  methods 0/1 (leave), 2 (restore to background) and 3 (restore to
  previous) composited across frames;
- frames smaller than / offset inside the logical screen.

``decode_gif`` returns the first frame composited onto the canvas as
float64 ``(h, w, 3)`` in [0, 1] — the image-decode convention shared
with the PNG/PNM/BMP/JPEG decoders.  ``decode_gif_frames`` returns the
full animation as ``(n_frames, h, w, 3)`` plus per-frame delays, for the
video path.  Truncated or structurally invalid payloads raise
``ValueError`` (caller falls back); there is no
recognized-but-undecodable subset — every conforming GIF decodes.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlaced GIF row order: four passes with (start, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: codes start at ``min_code_size + 1`` bits and
    grow to 12; ``clear`` resets the table, ``end`` terminates.  Codes
    are packed LSB-first across byte boundaries.  Decodes at most
    ``n_pixels`` indices (trailing garbage after a full raster is
    ignored, as real decoders do)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    # table as a list of bytes entries; reset() re-primes the literals
    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None

    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size

        if code == clear:
            table = fresh_table()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        # Width bump when the table size REACHES the width limit — the
        # timing every real encoder pairs with (giflib bumps after
        # writing code #i when its pre-insert next-code counter hits
        # 2^width, which equals this decoder's post-append table size;
        # verified against real-encoder GIFs in tests).  Capped at 12
        # bits; a full table stops growing until a clear.
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels])


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        if pos + ln > len(data):
            raise ValueError("GIF sub-block overruns payload")
        chunks.append(data[pos : pos + ln])
        pos += ln
    return b"".join(chunks), pos


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Reorder interlaced rows into display order (spec appendix E)."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def decode_gif_frames(
    data: bytes, *, max_frames: int | None = None
) -> tuple[np.ndarray, list[float]]:
    """Decode every frame of a GIF, composited per the disposal methods.

    Returns ``(frames, delays)``: frames is float64
    ``(n_frames, h, w, 3)`` in [0, 1] at the logical-screen size, delays
    is the per-frame delay in seconds (0.0 where unspecified)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if w == 0 or h == 0:
        raise ValueError("GIF zero-size logical screen")
    pos = 13
    global_ct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    # canvas starts black (background indices are rarely honored by real
    # renderers; black matches the fake-decode convention elsewhere)
    canvas = np.zeros((h, w, 3), dtype=np.float64)
    frames: list[np.ndarray] = []
    delays: list[float] = []
    transparent: int | None = None
    disposal = 0
    delay = 0.0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:   # trailer
            break
        if block == 0x21:   # extension
            if pos >= len(data):
                raise ValueError("GIF extension truncated")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:   # Graphic Control
                gflags, d = struct.unpack_from("<BH", body, 0)
                disposal = (gflags >> 2) & 0x07
                transparent = body[3] if gflags & 0x01 else None
                delay = d / 100.0
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")

        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = global_ct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rect outside logical screen")
        if pos >= len(data):
            raise ValueError("GIF missing LZW min code size")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        raster = _lzw_decode(min_code, lzw, fw * fh)
        if len(raster) < fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = np.frombuffer(raster, np.uint8).reshape(fh, fw)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF palette index out of range")
        if fpacked & 0x40:
            idx = _deinterlace(idx)

        saved = canvas.copy() if disposal == 3 else None
        rgb = ct[idx].astype(np.float64) / 255.0
        region = canvas[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[...] = np.where(mask, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(delay)

        # prepare the canvas for the NEXT frame per this frame's disposal
        if disposal == 2:      # restore to background → clear the rect
            canvas[fy : fy + fh, fx : fx + fw] = 0.0
        elif disposal == 3:    # restore to previous
            canvas = saved
        disposal, transparent, delay = 0, None, 0.0

        if max_frames is not None and len(frames) >= max_frames:
            break

    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF as float64 ``(h, w, 3)`` in [0, 1] — the
    image-decode convention of operators/multimodal.decode_payload."""
    frames, _ = decode_gif_frames(data, max_frames=1)
    return frames[0]
