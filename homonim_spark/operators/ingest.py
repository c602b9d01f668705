"""Ingest-time grid normalisation (S5/R3).

The reference wraps CRS-mismatched / non-aligned datasets in a
``WarpedVRT`` so everything downstream sees one canonical north-up grid
(``/root/reference/homonim/utils.py:182-225``,
``raster_pair.py:280-292``).  The engine's equivalent is a one-off Spark
job: tiles with *arbitrary* affine transforms are resampled onto the
canonical cell grid (``homonim_spark.grid``) before entering the fuse
pipeline — after this job every tile satisfies the aligned-grid contract
(cell-sized, north-up, integer-factor resolutions).

Per tile: compute the canonical cells its footprint covers, bilinear-sample
the canonical pixel centers from the tile (NaN outside / at nodata), emit
per-cell fragments; a groupBy(cell) mosaic merges fragments (valid pixels
win; overlaps average).  All inside Arrow UDFs; one shuffle.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from homonim_spark import grid
from homonim_spark.tiles import decode_tile, encode_tile

_FRAG_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("cell_id", T.LongType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("sum", T.BinaryType(), False),   # float32 value sums
    T.StructField("cnt", T.BinaryType(), False),   # float32 valid counts
])


def bilinear_sample(arr: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Sample ``arr`` at fractional pixel coords (ys, xs) bilinearly;
    NaN outside the array or where any contributing pixel is NaN (strict
    mask propagation, like rasterio's bilinear with nodata)."""
    h, w = arr.shape
    out = np.full(ys.shape, np.nan, dtype=np.float32)
    valid = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    if not valid.any():
        return out
    y = ys[valid]
    x = xs[valid]
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = (y - y0).astype(np.float32)
    wx = (x - x0).astype(np.float32)
    a = arr[y0, x0]; b = arr[y0, x1]; c = arr[y1, x0]; d = arr[y1, x1]
    vals = (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)
    out[valid] = vals
    return out


def _lanczos_w(t: np.ndarray, a: int = 3) -> np.ndarray:
    """Lanczos-a weights sinc(t)·sinc(t/a) on |t| < a (0 outside)."""
    out = np.zeros_like(t, dtype=np.float64)
    m = np.abs(t) < a
    tm = t[m]
    out[m] = np.sinc(tm) * np.sinc(tm / a)
    return out


def _catmull_rom_w(t: np.ndarray) -> np.ndarray:
    """Catmull-Rom cubic weights (a = −0.5) on |t| < 2."""
    at = np.abs(t)
    out = np.zeros_like(t, dtype=np.float64)
    m1 = at < 1
    m2 = ~m1 & (at < 2)
    out[m1] = 1.5 * at[m1] ** 3 - 2.5 * at[m1] ** 2 + 1.0
    out[m2] = -0.5 * at[m2] ** 3 + 2.5 * at[m2] ** 2 - 4.0 * at[m2] + 2.0
    return out


#: separable-kernel taps per resampling method: (pixel offsets, weight fn)
_KERNEL_TAPS = {
    "cubic": (np.arange(-1, 3), _catmull_rom_w),
    "lanczos": (np.arange(-2, 4), _lanczos_w),
}


def kernel_sample(arr: np.ndarray, ys: np.ndarray, xs: np.ndarray,
                  kind: str) -> np.ndarray:
    """Sample ``arr`` at fractional pixel coords with a separable kernel
    (Catmull-Rom 4×4 or Lanczos-3 6×6) using NORMALIZED CONVOLUTION over
    valid taps — GDAL's warp-with-nodata semantics (invalid/out-of-range
    taps are excluded and the kernel renormalized), which is what the
    reference gets from ``Resampling.lanczos``/``cubic`` on masked rasters
    (``raster_array.py:526-578``).  Targets outside the source extent, or
    with no valid tap, are NaN.  All-tap-valid interior points reduce to
    the textbook separable interpolation exactly (den = Σw = 1)."""
    offs, wfun = _KERNEL_TAPS[kind]
    h, w = arr.shape
    out = np.full(ys.shape, np.nan, dtype=np.float32)
    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    if not inb.any():
        return out
    y = ys[inb].astype(np.float64)
    x = xs[inb].astype(np.float64)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    wy = wfun((y - y0)[:, None] - offs[None, :])     # (n, k)
    wx = wfun((x - x0)[:, None] - offs[None, :])
    num = np.zeros(len(y), dtype=np.float64)
    den = np.zeros(len(y), dtype=np.float64)
    for i, dy in enumerate(offs):
        yy = y0 + dy
        y_ok = (yy >= 0) & (yy < h)
        yc = np.clip(yy, 0, h - 1)
        for j, dx in enumerate(offs):
            xx = x0 + dx
            ok = y_ok & (xx >= 0) & (xx < w)
            v = arr[yc, np.clip(xx, 0, w - 1)]
            ok &= ~np.isnan(v)
            wgt = np.where(ok, wy[:, i] * wx[:, j], 0.0)
            num += wgt * np.where(ok, v, 0.0)
            den += wgt
    with np.errstate(invalid="ignore"):
        vals = np.where(np.abs(den) > 1e-9, num / den, np.nan)
    out[inb] = vals.astype(np.float32)
    return out


def nearest_sample(arr: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Nearest-neighbor sample at fractional pixel coords; NaN outside."""
    h, w = arr.shape
    out = np.full(ys.shape, np.nan, dtype=np.float32)
    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    if not inb.any():
        return out
    yi = np.clip(np.rint(ys[inb]).astype(np.int64), 0, h - 1)
    xi = np.clip(np.rint(xs[inb]).astype(np.int64), 0, w - 1)
    out[inb] = arr[yi, xi]
    return out


_SAMPLERS = {
    "nearest": nearest_sample,
    "bilinear": bilinear_sample,
    "cubic": lambda a, y, x: kernel_sample(a, y, x, "cubic"),
    "lanczos": lambda a, y, x: kernel_sample(a, y, x, "lanczos"),
}


def regrid_tiles(tiles: DataFrame, res: int, tile_px: int,
                 grid_crs: str | None = None,
                 resampling: str = "bilinear") -> DataFrame:
    """Normalise arbitrary-transform tiles onto the canonical grid at
    resolution ``res`` with ``tile_px`` pixels per cell per dim.

    Input rows need (image_id, role, band, transform[6], h, w, data) where
    ``transform`` = (a, b, c, d, e, f): world x = a·col + b·row + c,
    world y = d·col + e·row + f (pixel-corner origin convention).

    Cross-CRS (R1/R3, the reference's ``WarpedVRT`` path,
    ``utils.py:190-209``): with ``grid_crs`` set and a per-tile ``crs``
    string column present, tiles whose CRS differs from the grid's are
    warped through the closed-form transforms in ``homonim_spark.crs``
    (WGS84 / Web-Mercator / UTM): canonical pixel centers are transformed
    into the tile's CRS before the inverse-affine bilinear sample.

    Output: canonical tiles (one per covered cell) with the standard
    engine schema subset; fragments from overlapping inputs are averaged.

    ``resampling``: ``'bilinear'`` (default — strict mask propagation,
    the oracle-pinned contract), ``'nearest'``, ``'cubic'`` (Catmull-Rom
    4×4), or ``'lanczos'`` (Lanczos-3 6×6) — the latter two use GDAL-style
    normalized convolution over valid taps, matching the reference's
    ``Resampling.lanczos`` reproject default (``raster_array.py:526-578``).
    """
    if resampling not in _SAMPLERS:
        raise ValueError(
            f"resampling must be one of {sorted(_SAMPLERS)}, got "
            f"{resampling!r}")
    sampler = _SAMPLERS[resampling]
    cell_sz = grid.cell_size(res)
    px_out = cell_sz / tile_px
    has_crs = grid_crs is not None and "crs" in tiles.columns

    def fragments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from homonim_spark.crs import transform_points
        for pdf in batches:
            out = {f.name: [] for f in _FRAG_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                arr = decode_tile(r.data, r.h, r.w)
                a, b, c, d, e, f_ = [float(v) for v in r.transform]
                tile_crs = getattr(r, "crs", None) if has_crs else None
                # NULL crs (e.g. a GTiff with no GeoKey directory) → assume
                # grid CRS, the documented legacy contract
                warp = isinstance(tile_crs, str) and tile_crs != grid_crs
                # covered cell range from the tile boundary (corners alone
                # underestimate under a curved warp — sample the perimeter)
                t = np.linspace(0.0, 1.0, 9)
                cols = np.concatenate([t * r.w, t * r.w,
                                       np.zeros_like(t), np.full_like(t, r.w)])
                rows = np.concatenate([np.zeros_like(t), np.full_like(t, r.h),
                                       t * r.h, t * r.h])
                xs = a * cols + b * rows + c
                ys = d * cols + e * rows + f_
                if warp:
                    xs, ys = transform_points(tile_crs, grid_crs, xs, ys)
                c0 = int(np.floor(xs.min() / cell_sz))
                c1 = int(np.floor((xs.max() - 1e-9) / cell_sz))
                r0 = int(np.floor(ys.min() / cell_sz))
                r1 = int(np.floor((ys.max() - 1e-9) / cell_sz))
                # inverse affine (a,b;d,e)
                det = a * e - b * d
                ia, ib, id_, ie = e / det, -b / det, -d / det, a / det
                # canonical pixel centers vectorized by CELL-ROW STRIPE:
                # one transform_points call and one sampler pass per stripe
                # (the per-cell-loop form made tile_px² warp calls per cell;
                # the full-canvas form bounded scratch by the tile's
                # bounding BOX, which under a curved warp or diagonal tile
                # can be many times the tile area — stripes cap scratch at
                # O(n_cols·tile_px²) while per-element arithmetic is
                # unchanged, so payloads stay bit-identical)
                crs_r = np.arange(r0, r1 + 1)
                crs_c = np.arange(c0, c1 + 1)
                gx = (crs_c[:, None] * cell_sz
                      + (np.arange(tile_px)[None, :] + 0.5) * px_out).ravel()
                for i_r, cr in enumerate(crs_r):
                    gy = (cr * cell_sz
                          + (np.arange(tile_px) + 0.5) * px_out)
                    WX, WY = np.meshgrid(gx, gy)
                    if warp:
                        fx, fy = transform_points(grid_crs, tile_crs,
                                                  WX.ravel(), WY.ravel())
                        WX = fx.reshape(WX.shape)
                        WY = fy.reshape(WY.shape)
                    # world → source pixel coords (center convention:
                    # pixel (i,j) center at col=j+0.5, row=i+0.5)
                    px_c = ia * (WX - c) + ib * (WY - f_) - 0.5
                    py_c = id_ * (WX - c) + ie * (WY - f_) - 0.5
                    vals_row = sampler(arr, py_c, px_c)
                    for i_c, cc in enumerate(crs_c):
                        vals = vals_row[:, i_c * tile_px:(i_c + 1) * tile_px]
                        valid = ~np.isnan(vals)
                        if not valid.any():
                            continue
                        out["image_id"].append(r.image_id)
                        out["role"].append(r.role)
                        out["band"].append(int(r.band))
                        out["cell_id"].append(grid.cell_id(res, int(cr), int(cc)))
                        out["h"].append(tile_px)
                        out["w"].append(tile_px)
                        out["sum"].append(encode_tile(np.where(valid, vals, 0)))
                        out["cnt"].append(encode_tile(valid.astype(np.float32)))
            yield pd.DataFrame(out)

    in_cols = ["image_id", "role", "band", "transform", "h", "w", "data"]
    if has_crs:
        in_cols.append("crs")
    frags = tiles.select(*in_cols).mapInPandas(fragments, schema=_FRAG_SCHEMA)

    out_schema = T.StructType([
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("row", T.IntegerType(), False),
        T.StructField("col", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("transform", T.ArrayType(T.DoubleType()), False),
        T.StructField("data", T.BinaryType(), False),
    ])

    def mosaic(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = None
        acc_sum = acc_cnt = None

        def flush(out):
            image_id, role, band, cell_id = cur
            with np.errstate(invalid="ignore"):
                vals = np.where(acc_cnt > 0, acc_sum / acc_cnt, np.nan).astype(np.float32)
            cr, cc = grid.cell_row(int(cell_id)), grid.cell_col(int(cell_id))
            out["media_ref"].append(f"tile://{image_id}/{role}/{band}/{cr}/{cc}")
            out["image_id"].append(image_id)
            out["role"].append(role)
            out["band"].append(int(band))
            out["cell_id"].append(int(cell_id))
            out["row"].append(cr)
            out["col"].append(cc)
            out["h"].append(tile_px)
            out["w"].append(tile_px)
            out["transform"].append([px_out, 0.0, cc * cell_sz, 0.0, px_out, cr * cell_sz])
            out["data"].append(encode_tile(vals))

        for pdf in batches:
            out = {f.name: [] for f in out_schema.fields}
            for row in zip(pdf["image_id"], pdf["role"], pdf["band"], pdf["cell_id"],
                           pdf["h"], pdf["w"], pdf["sum"], pdf["cnt"]):
                key = (row[0], row[1], int(row[2]), int(row[3]))
                s = decode_tile(row[6], row[4], row[5]).astype(np.float64)
                n = decode_tile(row[7], row[4], row[5]).astype(np.float64)
                if key != cur:
                    if cur is not None:
                        flush(out)
                    cur, acc_sum, acc_cnt = key, s.copy(), n.copy()
                else:
                    acc_sum += s
                    acc_cnt += n
            if out["cell_id"]:
                yield pd.DataFrame(out)
        if cur is not None:
            out = {f.name: [] for f in out_schema.fields}
            flush(out)
            yield pd.DataFrame(out)

    from homonim_spark.partitioning import pinned_repartition
    keyed = pinned_repartition(frags, "image_id", "role", "band", "cell_id") \
        .sortWithinPartitions("image_id", "role", "band", "cell_id")
    return keyed.mapInPandas(mosaic, schema=out_schema)


# ---------------------------------------------------------------------------
# executor-side real-file ingestion (S1/S3 at scale)
# ---------------------------------------------------------------------------

_BAND_ROW_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("transform", T.ArrayType(T.DoubleType()), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("crs", T.StringType(), True),
    T.StructField("data", T.BinaryType(), False),
])


def gtiff_band_rows(binary_files: DataFrame, role: str,
                    nodata: float | None = None) -> DataFrame:
    """Decode ``binaryFile`` rows (path, content) into per-band regrid-input
    rows — IN EXECUTORS, one task per file split.  At 100 TB of GTiffs this
    is the scan path: no payload ever touches the driver (the reference
    decodes windows via GDAL on one node, ``raster_array.py:129-199``).

    ``image_id`` = file stem; ``nodata`` overrides the file's own tag
    (None → use the tag).  Output feeds :func:`regrid_tiles` directly.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from homonim_spark.tiffio import read_gtiff
        for pdf in batches:
            out = {f.name: [] for f in _BAND_ROW_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                t = read_gtiff(bytes(r.content))
                if t.transform is None:
                    raise ValueError(f"{r.path}: no geo transform tags")
                nd = nodata if nodata is not None else t.nodata
                arr = t.data.astype(np.float32)
                if nd is not None:
                    arr[t.data == nd] = np.nan
                stem = r.path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                for band in range(arr.shape[0]):
                    out["image_id"].append(stem)
                    out["role"].append(role)
                    out["band"].append(band)
                    out["transform"].append([float(v) for v in t.transform])
                    out["h"].append(arr.shape[1])
                    out["w"].append(arr.shape[2])
                    out["crs"].append(t.crs)
                    out["data"].append(encode_tile(arr[band]))
            yield pd.DataFrame(out)

    return binary_files.select("path", "content").mapInPandas(
        decode, schema=_BAND_ROW_SCHEMA)


def gtiff_window_rows(spark, paths: list, role: str,
                      nodata: float | None = None,
                      window_rows: int = 512) -> DataFrame:
    """Windowed executor-side GTiff decode (S1 at scale, round-3 verdict
    #4): executors parse each file's IFD (a few KB of seeks — range GETs
    on object storage), plan block-aligned row windows with a 1-px halo,
    and each task reads + decodes ONLY its window's block byte ranges.
    One multi-GB aerial mosaic fans out to height/window_rows bounded
    tasks instead of one whole-file decode (the reference streams windows
    the same way, ``raster_array.py:129-199``).

    The 1-px halo makes the downstream bilinear regrid bit-identical to
    the whole-file path: every canonical pixel's interpolation neighbors
    exist in at least one window, and halo-overlap fragments carry
    identical values, so the mosaic average reproduces them exactly.
    """
    from homonim_spark.tiffio import read_gtiff_meta, decode_window

    paths_df = spark.createDataFrame(pd.DataFrame({"path": list(paths)}))

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                meta = read_gtiff_meta(p)
                if meta.transform is None:
                    raise ValueError(f"{p}: no geo transform tags")
                step = max(meta.block_h,
                           (window_rows // meta.block_h) * meta.block_h)
                for a in range(0, meta.height, step):
                    b = min(meta.height, a + step)
                    rows.append({"path": p, "y0": max(0, a - 1),
                                 "y1": min(meta.height, b + 1)})
            yield pd.DataFrame(rows, columns=["path", "y0", "y1"])

    from homonim_spark.partitioning import pinned_repartition
    units = pinned_repartition(
        paths_df.mapInPandas(plan, schema="path string, y0 int, y1 int"),
        "path", "y0")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        metas = {}
        for pdf in batches:
            out = {f.name: [] for f in _BAND_ROW_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                meta = metas.get(r.path)
                if meta is None:
                    meta = metas[r.path] = read_gtiff_meta(r.path)
                raw = decode_window(r.path, meta, int(r.y0), int(r.y1))
                arr = raw.astype(np.float32)
                nd = nodata if nodata is not None else meta.nodata
                if nd is not None:
                    arr[raw == nd] = np.nan
                a, b_, c, d, e, f_ = meta.transform
                # window-local affine: same pixel scale, origin shifted to
                # the window's first row
                tr = [a, b_, b_ * r.y0 + c, d, e, e * r.y0 + f_]
                stem = r.path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                for band in range(arr.shape[0]):
                    out["image_id"].append(stem)
                    out["role"].append(role)
                    out["band"].append(band)
                    out["transform"].append([float(v) for v in tr])
                    out["h"].append(arr.shape[1])
                    out["w"].append(arr.shape[2])
                    out["crs"].append(meta.crs)
                    out["data"].append(encode_tile(arr[band]))
            yield pd.DataFrame(out)

    return units.mapInPandas(decode, schema=_BAND_ROW_SCHEMA)


def ingest_gtiff_files_windowed(
    spark, path: str, role: str, res: int, tile_px: int,
    nodata: float | None = None, grid_crs: str | None = None,
    window_rows: int = 512, resampling: str = "bilinear",
) -> DataFrame:
    """End-to-end windowed real-file ingestion: glob → IFD-planned window
    units → per-window executor decode → canonical-grid regrid.  The
    large-single-file counterpart of :func:`ingest_gtiff_files` (which is
    one task per FILE and materializes whole files — fine for many small
    files, a memory spike and parallelism floor for multi-GB mosaics)."""
    import glob as _glob
    if path.startswith(("http://", "https://")):
        # remote object-store / https source: no filesystem glob — the
        # windowed reader speaks HTTP range requests directly (tiffio
        # ``_HttpRangeFile``; the reference's /vsicurl/ analogue)
        paths = [path]
    else:
        paths = sorted(_glob.glob(path))
        if not paths:
            raise FileNotFoundError(f"no files match {path!r}")
    return regrid_tiles(gtiff_window_rows(spark, paths, role, nodata,
                                          window_rows),
                        res, tile_px, grid_crs=grid_crs,
                        resampling=resampling)


def ingest_gtiff_files(spark, path: str, role: str, res: int, tile_px: int,
                       nodata: float | None = None,
                       grid_crs: str | None = None,
                       resampling: str = "bilinear") -> DataFrame:
    """Scan a directory/glob of GTiffs with ``binaryFile``, decode per-band
    in executors, and regrid onto the canonical cell grid — the end-to-end
    real-file ingestion used in place of driver-side ``read_gtiff(path)``.

    ``grid_crs``: CRS of the canonical grid.  Each file's own CRS comes from
    its GeoKey directory (ProjectedCSType/GeographicType); files in a
    different CRS are warped through ``homonim_spark.crs`` during the regrid
    (the reference's ``WarpedVRT`` path, ``utils.py:190-209``).  ``None``
    keeps the legacy behaviour: every file is assumed to already be in the
    grid CRS."""
    bf = spark.read.format("binaryFile").load(path)
    return regrid_tiles(gtiff_band_rows(bf, role, nodata), res, tile_px,
                        grid_crs=grid_crs, resampling=resampling)
