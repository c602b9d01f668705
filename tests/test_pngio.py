"""Pure-python PNG codec tests (no Spark session needed)."""

import struct
import zlib

import numpy as np
import pytest

from homonim_spark.pngio import read_png, write_png


def test_roundtrip_grey_and_rgb():
    rng = np.random.default_rng(0)
    grey = rng.integers(0, 256, (13, 7), dtype=np.uint8)
    assert np.array_equal(read_png(write_png(grey)), grey)
    rgb = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    assert np.array_equal(read_png(write_png(rgb)), rgb)
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    assert np.array_equal(read_png(write_png(rgba)), rgba)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a greyscale PNG using the given per-scanline filter types
    (exercises the decoder's Sub/Up/Average/Paeth paths, which write_png
    never emits)."""
    h, w = img.shape
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        line = img[y].astype(np.int32)
        enc = np.zeros(w, dtype=np.int32)
        for x in range(w):
            left = line[x - 1] if x else 0
            ul = prev[x - 1] if x else 0
            pred = {0: 0, 1: left, 2: prev[x],
                    3: (left + prev[x]) // 2,
                    4: paeth(left, int(prev[x]), ul)}[ft]
            enc[x] = (line[x] - pred) % 256
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_scanline_filters(filters):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (10, 6), dtype=np.uint8)
    assert np.array_equal(read_png(_png_with_filters(img, filters)), img)


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        read_png(b"notapng" + b"\0" * 20)
    with pytest.raises(ValueError, match="channel"):
        write_png(np.zeros((2, 2, 5), dtype=np.uint8))
