"""Minimal pure-python GeoTIFF reader (stdlib ``struct`` + ``zlib`` only).

Purpose: load the reference's committed golden artifacts — e.g.
``/root/reference/tests/data/parameter/float_100cm_rgb_FUSE_cREF_mGAIN-OFFSET_k5_5_PARAM.tif``
— so the engine's fuse numerics can be cross-checked against files the
reference itself produced (its ``ParamStats`` goldens,
``/root/reference/tests/test_stats.py:36-50``).  rasterio/GDAL are absent in
this environment; the goldens are small classic little-endian TIFFs with
deflate-compressed tiles or strips, which is a ~150-line parse.

Supported: classic (non-Big) TIFF, II byte order, compression 1 (none) and
8 (zlib/deflate), planar config 1 (chunky) and 2 (separate planes), tiled or
stripped layout, sample formats uint/int/float at 8/16/32/64 bits.  GDAL
per-band descriptions, ``FUSE_*`` metadata items and the nodata tag are
returned alongside the pixel cube.
"""

from __future__ import annotations

import re
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q"}

# sampleformat tag value → numpy kind
_SAMPLE_KIND = {1: "u", 2: "i", 3: "f"}


@dataclass
class GeoTiff:
    """Decoded image: ``data`` is (bands, height, width) float64-safe ndarray
    in the file's dtype; nodata already holds its raw value (use ``masked``
    for NaN-where-nodata float64)."""

    data: np.ndarray
    nodata: float | None = None
    band_names: list[str] = field(default_factory=list)
    metadata: dict = field(default_factory=dict)
    transform: tuple | None = None  # (px_w, 0, x0, 0, px_h, y0) if present

    def masked(self) -> np.ndarray:
        """float64 cube with nodata → NaN."""
        out = self.data.astype(np.float64)
        if self.nodata is not None and not np.isnan(self.nodata):
            out[self.data == self.nodata] = np.nan
        return out


def _read_ifd(buf: bytes, off: int, bo: str):
    (n,) = struct.unpack_from(bo + "H", buf, off)
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off + 2 + i * 12)
        raw = buf[off + 10 + i * 12: off + 14 + i * 12]
        tags[tag] = (typ, cnt, raw)
    (nxt,) = struct.unpack_from(bo + "I", buf, off + 2 + n * 12)
    return tags, nxt


def _tag_value(buf: bytes, t, bo: str):
    typ, cnt, raw = t
    size = _TYPE_SIZE.get(typ, 1) * cnt
    if size <= 4:
        data = raw[:size]
    else:
        (o,) = struct.unpack(bo + "I", raw)
        data = buf[o: o + size]
    if typ == 2:  # ascii
        return data.rstrip(b"\0").decode("utf-8", "replace")
    if typ in (5, 10):  # rational
        vals = struct.unpack(bo + f"{cnt * 2}" + ("I" if typ == 5 else "i"), data)
        return [vals[i] / vals[i + 1] if vals[i + 1] else float("nan")
                for i in range(0, len(vals), 2)]
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:
        return data
    return list(struct.unpack(bo + str(cnt) + fmt, data))


def _parse_gdal_metadata(xml: str):
    """GDAL_METADATA is a flat XML of <Item name=.. [sample=..] [role=..]>."""
    items, band_names = {}, {}
    for m in re.finditer(
        r"<Item\s+name=\"([^\"]+)\"(?:\s+sample=\"(\d+)\")?"
        r"(?:\s+role=\"([^\"]+)\")?\s*>([^<]*)</Item>", xml
    ):
        name, sample, role, val = m.groups()
        if role == "description" and sample is not None:
            band_names[int(sample)] = val
        else:
            items[name] = val
    return items, band_names


def read_gtiff(src: "str | bytes | bytearray | memoryview") -> GeoTiff:
    """Decode a GeoTIFF from a filesystem path OR raw bytes.

    The bytes form is the executor-side ingestion path:
    ``spark.read.format('binaryFile')`` delivers file contents as a binary
    column, so decode happens where the data is (the reference streams
    windows via GDAL on one node, ``raster_array.py:129-199``; the engine
    streams whole files through executors instead)."""
    buf = bytes(src) if isinstance(src, (bytes, bytearray, memoryview)) \
        else open(src, "rb").read()
    if buf[:2] != b"II":
        raise ValueError("only little-endian (II) classic TIFF supported")
    bo = "<"
    magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic {magic})")
    tags, _ = _read_ifd(buf, ifd_off, bo)
    g = lambda tag, default=None: (_tag_value(buf, tags[tag], bo)
                                   if tag in tags else default)

    width, height = g(256)[0], g(257)[0]
    spp = g(277, [1])[0]
    bits = g(258, [8])[0]
    comp = g(259, [1])[0]
    planar = g(284, [1])[0]
    sfmt = g(339, [1])[0]
    dtype = np.dtype(f"{bo}{_SAMPLE_KIND[sfmt]}{bits // 8}")

    if comp not in (1, 8):
        raise ValueError(f"unsupported compression {comp} (need none/deflate)")
    decomp = (lambda b: b) if comp == 1 else zlib.decompress

    out = np.zeros((spp, height, width), dtype=dtype.newbyteorder("="))

    def paint(block: np.ndarray, band0: int, y0: int, x0: int):
        """Place a decoded block; block is (h, w, bands_in_block)."""
        h = min(block.shape[0], height - y0)
        w = min(block.shape[1], width - x0)
        for bi in range(block.shape[2]):
            out[band0 + bi, y0: y0 + h, x0: x0 + w] = block[:h, :w, bi]

    if 324 in tags:  # tiled
        tw, tl = g(322)[0], g(323)[0]
        offs, cnts = g(324), g(325)
        tiles_x = (width + tw - 1) // tw
        tiles_y = (height + tl - 1) // tl
        per_plane = tiles_x * tiles_y
        bpb = spp if planar == 1 else 1
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = np.frombuffer(decomp(buf[o: o + c]), dtype=dtype)
            block = raw.reshape(tl, tw, bpb)
            plane = 0 if planar == 1 else i // per_plane
            j = i if planar == 1 else i % per_plane
            paint(block, plane, (j // tiles_x) * tl, (j % tiles_x) * tw)
    else:  # stripped
        rps = g(278, [height])[0]
        offs, cnts = g(273), g(279)
        strips_per_plane = (height + rps - 1) // rps
        bpb = spp if planar == 1 else 1
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = np.frombuffer(decomp(buf[o: o + c]), dtype=dtype)
            plane = 0 if planar == 1 else i // strips_per_plane
            j = i if planar == 1 else i % strips_per_plane
            h = min(rps, height - j * rps)
            paint(raw.reshape(h, width, bpb), plane, j * rps, 0)

    nodata = None
    nd = g(42113)
    if nd is not None:
        nodata = float(nd.strip())
    meta, band_names = {}, {}
    xml = g(42112)
    if xml:
        meta, band_names = _parse_gdal_metadata(xml)
    transform = None
    scale, tie = g(33550), g(33922)
    if scale and tie and len(tie) >= 6:
        # tiepoint (i,j,k,x,y,z): raster (i,j) ↦ model (x,y); north-up
        transform = (scale[0], 0.0, tie[3] - tie[0] * scale[0],
                     0.0, -scale[1], tie[4] + tie[1] * scale[1])
    return GeoTiff(
        data=out, nodata=nodata,
        band_names=[band_names.get(i, f"B{i + 1}") for i in range(spp)],
        metadata=meta, transform=transform,
    )
