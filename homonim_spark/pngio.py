"""Minimal pure-python PNG codec (stdlib ``struct`` + ``zlib`` only).

Gives the multimodal operators a REAL compressed-image decode path in this
container (no PIL/cv2): 8-bit greyscale / RGB / greyscale+alpha / RGBA,
non-interlaced, all five PNG scanline filters on decode; encode emits
filter-0 scanlines with one zlib IDAT.  This replaces the round-1
``NotImplementedError`` stub for the ``png`` codec in
``operators/multimodal.py`` (VERDICT r01 next-step #7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# colortype → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def read_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 ndarray, (h, w) for greyscale or (h, w, c)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG: depth={depth} colortype={color}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if ftype == 1:    # Sub — sequential along the row per channel
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + int(_paeth(
                    np.uint8(a), prev[x], np.uint8(c)))) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def write_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 (h, w) or (h, w, {1,2,3,4}) array as PNG bytes
    (filter 0, single zlib IDAT)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    lines = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    idat = zlib.compress(lines, 6)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    return (_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
