"""Sinks: corrected-image output with dtype conversion, overview pyramids.

Reference: ``RasterArray.to_rio_dataset`` + ``_convert_array_dtype``
(``/root/reference/homonim/raster_array.py:424-500,353-387``) — dtype
promote/round/clip + nodata rewrite on write — and the overview build
(``/root/reference/homonim/fuse.py:151-165``): power-of-2 downsampled
pyramids, ≤8 levels, min 256 px.

Spark-native: the dtype conversion runs inside the write-path Arrow UDF
(numpy semantics identical to the reference: round-half-to-even, clip to
iinfo bounds); overviews are parent-cell coarsening aggregations on the
H3-style grid — each level is one ``groupBy(parent(cell))`` with block-mean
averaging, exactly the aperture-4 hierarchy.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from homonim_spark import grid
from homonim_spark.kernel import ops
from homonim_spark.tiles import convert_array_dtype, decode_tile, encode_tile

_OUT_TILE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("cell_id", T.LongType(), False),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("dtype", T.StringType(), False),
    T.StructField("nodata", T.DoubleType(), True),
    T.StructField("data", T.BinaryType(), False),
])


def convert_tiles(
    fused: DataFrame,
    value_col: str = "corr",
    dtype: str = "float32",
    nodata: Optional[float] = None,
    scale_h: int = 1,
) -> DataFrame:
    """Dtype-convert a fused payload column for the sink (S6/S7).

    ``scale_h``: payload dim = h·scale_h (corr tiles are factor× the proc
    tile). Conversion semantics match the reference exactly
    (``raster_array.py:353-387``): promote → clip to integer bounds →
    ``np.round`` (half-to-even) → rewrite masked pixels to ``nodata``.
    """

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _OUT_TILE_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                data = getattr(r, value_col)
                if data is None:
                    continue
                hh, ww = r.h * scale_h, r.w * scale_h
                n_px = len(data) // 4
                if hh * ww != n_px:
                    # payload lives on a different grid than h·scale_h can
                    # express (e.g. proc-crs=ref with a coarser-than-ref
                    # source: params on the ref grid, corr on the src grid,
                    # related by 1/f) — derive the square payload side from
                    # the byte length instead of crashing in the reshape
                    side = int(np.sqrt(n_px))
                    if side * side != n_px:
                        raise ValueError(
                            f"convert_tiles: payload of {n_px} px for "
                            f"(image_id={r.image_id}, band={r.band}, "
                            f"cell_id={r.cell_id}) matches neither "
                            f"h*scale_h x w*scale_h = {hh}x{ww} nor a "
                            f"square tile; cannot infer geometry")
                    hh = ww = side
                arr = decode_tile(data, hh, ww)
                conv_arr = convert_array_dtype(arr, dtype, nodata)
                out["image_id"].append(r.image_id)
                out["band"].append(int(r.band))
                out["cell_id"].append(int(r.cell_id))
                out["media_ref"].append(getattr(r, "media_ref", None))
                out["h"].append(hh)
                out["w"].append(ww)
                out["dtype"].append(dtype)
                out["nodata"].append(nodata)
                out["data"].append(np.ascontiguousarray(conv_arr).tobytes())
            yield pd.DataFrame(out)

    cols = ["image_id", "band", "cell_id", "h", "w", value_col]
    if "media_ref" in fused.columns:
        cols.append("media_ref")
    return fused.select(*cols).mapInPandas(conv, schema=_OUT_TILE_SCHEMA)


def write_corrected(
    fused: DataFrame, path: str, dtype: str = "float32",
    nodata: Optional[float] = None, scale_h: int = 1,
    partition_by_band: bool = True,
) -> None:
    """S6/S8: corrected-tile sink — parquet partitioned by band (the
    columnar stand-in for the Iceberg table; band partitioning gives the
    same partition pruning the reference gets from per-band reads)."""
    out = convert_tiles(fused, "corr", dtype, nodata, scale_h)
    w = out.write.mode("overwrite")
    if partition_by_band:
        w = w.partitionBy("band")
    w.parquet(path)


def export_corrected_gtiff(
    fused: DataFrame, out_dir: str, dtype: str = "float32",
    nodata: Optional[float] = None, scale_h: int = 1,
    res: Optional[int] = None, tile: Optional[tuple] = (256, 256),
    compress: bool = True, epsg: Optional[int] = None,
    build_ovw: bool = False, ovw_min_px: int = 256,
) -> DataFrame:
    """S8 file-format parity: write ONE corrected GeoTIFF per image — the
    artifact a homonim user actually consumes (the reference writes
    ``*_FUSE_*.tif`` via rasterio, ``fuse.py:193-252``).  With
    ``build_ovw`` each export also carries internal overview IFDs
    (power-of-2 average pyramid, the reference's ``--build-ovw`` default,
    ``fuse.py:152-165,287``) — built in the same executor task, no extra
    Spark stage.

    Distributed per image: tiles are dtype-converted by
    :func:`convert_tiles`, hash-partitioned by ``image_id``, and each
    group's executor assembles the image canvas from its cells and writes
    a tiled/deflate GTiff (``tiffio.write_gtiff``) with the canonical-grid
    transform and nodata tag.  Per-task memory is one output IMAGE — the
    same bound as the reference's sequential single-file writer; for
    mosaics beyond executor memory, write windows to the parquet/Iceberg
    sink instead and export lazily.  Returns (image_id, band?, path, h, w)
    manifest rows — paths are executor-local, so ``out_dir`` must be
    shared storage on a real cluster.
    """
    from homonim_spark import grid as _grid

    conv = convert_tiles(fused, "corr", dtype, nodata, scale_h)

    def write_image(pdf: pd.DataFrame) -> pd.DataFrame:
        image_id = pdf["image_id"].iloc[0]
        # grid resolution is encoded in every cell id — deriving it here
        # (instead of a caller-supplied parameter) makes a silently wrong
        # geotransform impossible for data at a non-default resolution
        cell_sz = _grid.cell_size(int(_grid.cell_res(
            int(pdf["cell_id"].iloc[0]))) if res is None else res)
        t = int(pdf["h"].max())
        rows = _grid.cell_row(pdf["cell_id"].to_numpy())
        cols = _grid.cell_col(pdf["cell_id"].to_numpy())
        r0, c0 = int(rows.min()), int(cols.min())
        nb = int(pdf["band"].max()) + 1
        H = (int(rows.max()) - r0 + 1) * t
        W = (int(cols.max()) - c0 + 1) * t
        dt = np.dtype(dtype)
        nd = nodata if nodata is not None else \
            (np.nan if dt.kind == "f" else 0)
        canvas = np.full((nb, H, W), nd, dtype=dt)
        for r in pdf.itertuples(index=False):
            arr = np.frombuffer(r.data, dtype=dt.newbyteorder("<")) \
                .reshape(r.h, r.w)
            rr = (_grid.cell_row(int(r.cell_id)) - r0) * t
            cc = (_grid.cell_col(int(r.cell_id)) - c0) * t
            canvas[int(r.band), rr: rr + r.h, cc: cc + r.w] = arr
        # the engine grid's row axis points toward +y; GeoTIFF convention
        # is north-up (y decreasing with row) — flip rows and anchor the
        # tiepoint at the top edge so any GIS reader sees the right world
        canvas = canvas[:, ::-1, :]
        px = cell_sz / t
        transform = (px, 0.0, c0 * cell_sz, 0.0, -px,
                     (r0 * cell_sz) + H * px)
        from homonim_spark.tiffio import build_overviews, write_gtiff
        path = f"{out_dir}/{image_id}_FUSE.tif"
        ovw = (build_overviews(canvas, nodata=nodata,
                               min_level_pixels=ovw_min_px)
               if build_ovw else None)
        write_gtiff(path, canvas, transform=transform,
                    nodata=None if nodata is None else float(nodata),
                    tile=tile, compress=compress, epsg=epsg, overviews=ovw)
        return pd.DataFrame([{"image_id": image_id, "path": path,
                              "n_bands": nb, "height": H, "width": W}])

    os_schema = ("image_id string, path string, n_bands int, "
                 "height int, width int")
    import os as _os
    _os.makedirs(out_dir, exist_ok=True)
    return conv.groupBy("image_id").applyInPandas(write_image,
                                                  schema=os_schema)


def run_manifest(model, kernel_shape, proc_crs, bands: int,
                 find_r2: bool = False, extra: Optional[dict] = None) -> dict:
    """S10: the metadata tag set the reference writes on outputs
    (``FUSE_*`` tags + per-band descriptions ``B1_GAIN``…,
    ``/root/reference/homonim/fuse.py:193-252``) — attach to the output
    table as properties / a manifest JSON via ``lineage.StageRunner``."""
    n_param = 3 if find_r2 else 2
    band_names = []
    for kind_i, kind in enumerate(("GAIN", "OFFSET", "R2")[:n_param]):
        band_names += [f"B{b + 1}_{kind}" for b in range(bands)]
    return {
        "FUSE_SRC_FILE": extra.get("src") if extra else None,
        "FUSE_REF_FILE": extra.get("ref") if extra else None,
        "FUSE_MODEL": str(model),
        "FUSE_KERNEL_SHAPE": tuple(kernel_shape),
        "FUSE_PROC_CRS": str(proc_crs),
        "band_descriptions": band_names,
    }


_OVERVIEW_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("cell_id", T.LongType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("data", T.BinaryType(), False),
])


def _coarsen_level(tiles: DataFrame, tile_px: int, value_col: str) -> DataFrame:
    """One pyramid level: 4 child tiles → 1 parent tile at half resolution.

    groupBy(parent(cell_id)) — a single shuffle whose groups are exactly 4
    rows; block-mean downsample inside the UDF (NaN-aware average, the
    reference's overview resampling default).
    """

    def coarsen(key, pdf: pd.DataFrame) -> pd.DataFrame:
        image_id, band, parent_id = key
        canvas = np.full((2 * tile_px, 2 * tile_px), np.nan, dtype=np.float32)
        for r in pdf.itertuples(index=False):
            cr = grid.cell_row(int(r.cell_id)) & 1
            cc = grid.cell_col(int(r.cell_id)) & 1
            canvas[cr * tile_px : (cr + 1) * tile_px, cc * tile_px : (cc + 1) * tile_px] = \
                decode_tile(r.data, tile_px, tile_px)
        out = ops.downsample_average(canvas, (2, 2))
        return pd.DataFrame({
            "image_id": [image_id], "band": [int(band)], "cell_id": [int(parent_id)],
            "h": [tile_px], "w": [tile_px], "data": [encode_tile(out)],
        })

    src = tiles.select(
        "image_id", "band", "cell_id",
        F.col(value_col).alias("data"),
        grid.parent_expr(F.col("cell_id")).alias("parent_id"),
    )
    return src.groupBy("image_id", "band", "parent_id").applyInPandas(
        coarsen, schema=_OVERVIEW_SCHEMA)


def overview_level_count(shape: tuple, max_levels: int = 8,
                         min_px: int = 256) -> int:
    """The reference's overview stop rule (``fuse.py:151-165``): levels are
    successive powers of 2, limited so the highest level keeps at least
    ``min_px`` pixels along the shortest dimension and there are at most
    ``max_levels`` levels."""
    import numpy as np
    if min(shape) < 1:
        return 0
    max_ovw = int(np.floor(np.log2(min(shape))))
    return max(0, min(int(max_levels), max_ovw - int(np.log2(min_px))))


def build_overviews(
    tiles: DataFrame, tile_px: int, value_col: str = "data",
    max_levels: int = 8, min_px: int = 256,
) -> list[DataFrame]:
    """S9: overview pyramid with the reference's stop rule
    (``/root/reference/homonim/fuse.py:151-165``) enforced per image:
    each image gets ``min(max_levels, floor(log2(min_shape)) −
    log2(min_px))`` levels, computed from tile metadata (one metadata-scale
    aggregate — payloads never reach the driver).  Each returned DataFrame
    is one level, lazily defined, one 4-rows-per-group shuffle per level;
    images whose rule stops earlier simply drop out of deeper levels."""
    row, col = grid.cell_row_col_expr(F.col("cell_id"))
    # Per-image level counts COMPUTED AS A COLUMN — no image list ever
    # reaches the driver (at 100 TB the former driver round-trip was
    # O(n_images) rows pulled plus O(n_images) rebuilt per level).  The rule
    # max(0, min(max_levels, floor(log2(min_shape)) - log2(min_px))) is
    # evaluated in exact integer math: floor(log2(n)) == length(bin(n)) - 1
    # for n ≥ 1, so no float-log boundary drift vs the numpy driver rule.
    min_shape = F.least(F.col("ch"), F.col("cw")) * F.lit(tile_px)
    max_ovw = F.length(F.bin(min_shape)) - F.lit(1)
    log2_min_px = int(np.log2(min_px))
    n_levels_col = F.when(
        min_shape < 1, F.lit(0)
    ).otherwise(F.greatest(F.lit(0), F.least(F.lit(int(max_levels)),
                                             max_ovw - F.lit(log2_min_px))))
    lvl = (tiles.groupBy("image_id")
           .agg((F.max(row) - F.min(row) + 1).alias("ch"),
                (F.max(col) - F.min(col) + 1).alias("cw"))
           .select("image_id", n_levels_col.alias("n_levels")))
    # the ONE driver-visible value: the pyramid depth (a scalar aggregate)
    total = lvl.agg(F.max("n_levels")).first()[0] or 0
    levels = []
    cur = tiles if value_col == "data" else tiles.withColumnRenamed(value_col, "data")
    for i in range(total):
        # per-level image filter as a broadcast semi-join — an isin() list
        # would grow the plan linearly with image count (100 TB = millions
        # of images); the joined dim stays metadata-scale
        live = lvl.filter(F.col("n_levels") >= i + 1).select("image_id")
        cur = _coarsen_level(cur.join(F.broadcast(live), "image_id", "left_semi"),
                             tile_px, "data")
        levels.append(cur)
    return levels
