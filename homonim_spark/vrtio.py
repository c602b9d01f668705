"""Minimal GDAL VRT reader (stdlib ``xml.etree`` + ``tiffio``).

Completes the S1 scan surface (GeoTIFF *and* VRT,
``/root/reference/homonim/raster_pair.py`` opens either): a VRT is an XML
mosaic/metadata wrapper over source rasters.  Rather than materializing the
mosaic (GDAL renders it window-by-window), :func:`vrt_sources` returns one
entry per (band, source file) with the source's own pixel grid and its
WORLD transform derived from the VRT geotransform and ``DstRect`` — exactly
the shape :func:`homonim_spark.operators.ingest.regrid_tiles` ingests, so a
VRT mosaic enters the engine as independent fragments and the canonical
grid does the mosaicking (overlaps average, like the fragment contract).

:func:`vrt_band_metadata` surfaces per-band ``center_wavelength`` / name
items (STAC-style MDI entries) — the inputs of the J2 wavelength band
matcher (``operators/matching.py``).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


@dataclass
class VrtSource:
    filename: str          # absolute path
    source_band: int       # 1-based band inside the source file
    vrt_band: int          # 1-based band in the VRT
    nodata: float | None
    # world transform of the SOURCE pixel grid (a, b, c, d, e, f):
    # x = a·col + b·row + c ; y = d·col + e·row + f
    transform: tuple = ()
    src_rect: tuple = ()   # (xoff, yoff, xsize, ysize) in source px
    dst_rect: tuple = ()   # (xoff, yoff, xsize, ysize) in VRT px


@dataclass
class VrtInfo:
    width: int
    height: int
    transform: tuple
    srs: str = ""
    sources: list = field(default_factory=list)
    band_metadata: list = field(default_factory=list)


def _rect(el) -> tuple:
    return tuple(float(el.get(k)) for k in ("xOff", "yOff", "xSize", "ySize"))


def read_vrt(path: str) -> VrtInfo:
    root = ET.parse(path).getroot()
    width = int(root.get("rasterXSize"))
    height = int(root.get("rasterYSize"))
    gt_el = root.find("GeoTransform")
    if gt_el is None:
        raise ValueError(f"{path}: VRT without GeoTransform")
    # GDAL order: (x0, px_w, rot_x, y0, rot_y, px_h)
    g = [float(v) for v in gt_el.text.split(",")]
    transform = (g[1], g[2], g[0], g[4], g[5], g[3])
    srs_el = root.find("SRS")
    info = VrtInfo(width=width, height=height, transform=transform,
                   srs=(srs_el.text or "") if srs_el is not None else "")
    base = os.path.dirname(os.path.abspath(path))
    a, b, c, d, e, f = transform

    for band_el in root.findall("VRTRasterBand"):
        vrt_band = int(band_el.get("band"))
        nd_el = band_el.find("NoDataValue")
        band_nodata = float(nd_el.text) if nd_el is not None else None
        meta = {"band": vrt_band}
        md = band_el.find("Metadata")
        if md is not None:
            for mdi in md.findall("MDI"):
                meta[mdi.get("key")] = (mdi.text or "").strip()
        ci = band_el.find("ColorInterp")
        if ci is not None:
            meta["color_interp"] = (ci.text or "").strip()
        info.band_metadata.append(meta)

        for tag in ("ComplexSource", "SimpleSource"):
            for s in band_el.findall(tag):
                fn = s.find("SourceFilename")
                rel = fn.get("relativeToVRT") == "1"
                fpath = os.path.join(base, fn.text) if rel else fn.text
                sb = int(s.findtext("SourceBand", "1"))
                src_rect = _rect(s.find("SrcRect"))
                dst_rect = _rect(s.find("DstRect"))
                nd = s.findtext("NODATA")
                # world transform of the source grid: source pixel (row,
                # col) maps to VRT pixel (yOff + row·sy, xOff + col·sx)
                sx = dst_rect[2] / src_rect[2]
                sy = dst_rect[3] / src_rect[3]
                col0 = dst_rect[0] - src_rect[0] * sx
                row0 = dst_rect[1] - src_rect[1] * sy
                st = (a * sx, b * sy, c + a * col0 + b * row0,
                      d * sx, e * sy, f + d * col0 + e * row0)
                info.sources.append(VrtSource(
                    filename=fpath, source_band=sb, vrt_band=vrt_band,
                    nodata=float(nd) if nd is not None else band_nodata,
                    transform=st, src_rect=src_rect, dst_rect=dst_rect,
                ))
    return info


def vrt_sources(path: str) -> list:
    """Flat per-(band, source-file) list ready for ``regrid_tiles``."""
    return read_vrt(path).sources


def vrt_band_metadata(path: str) -> list:
    """Per-band metadata dicts: band, name, center_wavelength (float when
    parseable), color_interp, … — the J2 band matcher's input."""
    out = []
    for m in read_vrt(path).band_metadata:
        m = dict(m)
        cw = m.get("center_wavelength")
        if cw is not None:
            try:
                m["center_wavelength"] = float(cw)
            except ValueError:
                pass
        out.append(m)
    return out
