"""The fuse pipeline — the engine's flagship dataflow.

Reference lifecycle (``/root/reference/homonim/fuse.py:321-408``): block-pair
stream → threadpool → per-block fit+apply → locked windowed writes.  The
Spark-native re-expression:

    documents ──posexplode(spans)──► media spans
        │                               │ hash join on media_ref
        ▼                               ▼
    span structure                 tile payloads
                                        │ (src tiles block-mean → proc grid)
                                        ▼
                         halo explode (JVM-side neighbor keys,
                         Arrow UDF slices only the needed strips)
                                        │ ONE shuffle on (image_id, band, cell_id)
                                        ▼
                groupBy cell ► applyInPandas(assemble + fit + apply)
                                        │
                      corrected tiles + parameter tiles
                                        │ join back on media_ref
                                        ▼
            documents regrouped (array_sort by offset — span-sequence
            equality preserved exactly)

Design notes for 100 TB scale:
- The src↔ref pairing (reference's BlockPair generation,
  ``raster_pair.py:342-428``) is NOT a separate join: source and reference
  tiles are unioned with a ``role`` column and co-grouped in the same
  shuffle that delivers the halo — one exchange instead of two.
- Halo volume is ``tile²·(1 + ~4·overlap/tile)`` per tile, not 9× — only
  the needed edge strips are shuffled.
- Group state is bounded: one group = one cell = O(tile²) bytes regardless
  of total data size; keys (image_id, band, cell_id) are near-uniform, so
  no skew salting is needed on this exchange (the skew-prone join is the
  many-src-tiles-per-ref-cell case handled in ``operators.spatial``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from homonim_spark import grid
from homonim_spark.enums import ImageContentError, Model, ProcCrs
from homonim_spark.kernel import ops
from homonim_spark.kernel.models import (
    KernelModelParams,
    apply_model,
    fit_model,
    overlap_for_kernel,
)
from homonim_spark.tiles import decode_tile, encode_tile

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------

HALO_PIECE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("cell_id", T.LongType(), False),      # destination cell
    T.StructField("role", T.StringType(), False),       # 'src' | 'ref' | 'src_orig'
    T.StructField("py", T.IntegerType(), False),        # placement row in block
    T.StructField("px", T.IntegerType(), False),        # placement col in block
    T.StructField("ph", T.IntegerType(), False),
    T.StructField("pw", T.IntegerType(), False),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("data", T.BinaryType(), False),
])

FUSED_TILE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("cell_id", T.LongType(), False),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("corr", T.BinaryType(), True),        # corrected src tile (src grid)
    T.StructField("gain", T.BinaryType(), False),       # param tiles (proc grid)
    T.StructField("offset", T.BinaryType(), False),
    T.StructField("r2", T.BinaryType(), True),
    T.StructField("n_valid", T.LongType(), False),      # lineage/metrics
])


@dataclass(frozen=True)
class FuseConfig:
    """Per-run planning constants (the reference resolves these at pair-open
    time, ``raster_pair.py:88-95,193-269``; the engine fixes them at ingest)."""

    tile: int                  # proc-grid pixels per cell per dim
    factor: int                # src pixels per proc pixel per dim
    params: KernelModelParams = KernelModelParams()
    proc_crs: ProcCrs = ProcCrs.ref


def infer_fuse_config(tiles: DataFrame, params: KernelModelParams,
                      proc_crs: ProcCrs = ProcCrs.ref) -> FuseConfig:
    """Resolve tile size / resample factor from tile metadata (metadata-scale
    aggregate — two longs per role, never the payloads)."""
    sizes = {r["role"]: r["h"] for r in
             tiles.groupBy("role").agg(F.max("h").alias("h")).collect()}
    ref_h = int(sizes.get("ref", 0))
    src_h = int(sizes.get("src", ref_h))
    if ref_h <= 0:
        raise ImageContentError("no reference tiles found")
    if src_h % ref_h != 0:
        raise ImageContentError(f"src tile {src_h} not an integer multiple of ref tile {ref_h}")
    return FuseConfig(tile=ref_h, factor=src_h // ref_h, params=params, proc_crs=ProcCrs(proc_crs))


# ---------------------------------------------------------------------------
# stage 1: documents → referenced tile payloads
# ---------------------------------------------------------------------------

def explode_spans(documents: DataFrame) -> DataFrame:
    """documents → one row per span, position-preserving."""
    return documents.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id", "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def referenced_tiles(documents: DataFrame, tiles: DataFrame) -> DataFrame:
    """Tiles actually referenced by document media spans — hash join on
    media_ref (both sides large at scale; AQE handles any hot payloads)."""
    refs = (
        explode_spans(documents)
        .filter(F.col("kind") == "media")
        .select("media_ref")
        .distinct()
    )
    return tiles.join(refs, "media_ref", "inner")


def coverage_audit(tiles: DataFrame) -> int:
    """J5: src cells with no same-cell ref tile — the engine analogue of the
    reference's covers_bounds check (``utils.py:228-252``,
    ``raster_pair.py:93-94``). Returns the violation count (0 == covered)."""
    src_cells = tiles.filter(F.col("role") == "src").select("image_id", "band", "cell_id").distinct()
    ref_cells = tiles.filter(F.col("role") == "ref").select("image_id", "band", "cell_id").distinct()
    return src_cells.join(ref_cells, ["image_id", "band", "cell_id"], "left_anti").count()


# ---------------------------------------------------------------------------
# stage 2: halo explode (the reference's block-overlap materialisation, P3/P4)
# ---------------------------------------------------------------------------

def halo_explode(tiles: DataFrame, cfg: FuseConfig) -> DataFrame:
    """Emit every proc-grid tile to its own cell plus the edge strips its
    8 neighbors need for kernel-sum continuity (reference overlap semantics:
    in-blocks overlap by ceil(k/2), ``raster_pair.py:342-428`` +
    ``utils.py:136-153``).  The original-resolution src tile rides along as
    a center-only ``src_orig`` piece for the apply stage.

    Strip slicing happens in an Arrow UDF; destination cell ids are computed
    JVM-side before it so the shuffle key never touches Python.
    """
    tile_px = cfg.tile
    oh, ow = overlap_for_kernel(cfg.params.kernel_shape)
    factor = cfg.factor
    ship_coverage = cfg.params.mask_partial

    def slice_pieces(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "band", "cell_id", "role", "py", "px",
                                   "ph", "pw", "media_ref", "data")}

            def emit(img, band, cid, role, py, px, arr, mref=None):
                out["image_id"].append(img)
                out["band"].append(band)
                out["cell_id"].append(cid)
                out["role"].append(role)
                out["py"].append(py)
                out["px"].append(px)
                out["ph"].append(arr.shape[0])
                out["pw"].append(arr.shape[1])
                out["media_ref"].append(mref)
                out["data"].append(encode_tile(arr))

            def emit_with_halo(img, band, cid, role, arr):
                """Center piece + the 8 neighbor edge strips of one proc tile.

                ``dr`` is the destination cell's offset from this tile:
                dest below (dr=+1) needs my bottom ``oh`` rows placed above
                its own center (block rows [0, oh)), etc.
                """
                for dr in (-1, 0, 1):
                    if dr == 0:
                        r0, r1, py = 0, tile_px, oh
                    elif dr == 1:
                        r0, r1 = max(0, tile_px - oh), tile_px
                        py = oh - (r1 - r0)
                    else:
                        r0, r1, py = 0, min(oh, tile_px), oh + tile_px
                    for dc in (-1, 0, 1):
                        if dc == 0:
                            c0, c1, px = 0, tile_px, ow
                        elif dc == 1:
                            c0, c1 = max(0, tile_px - ow), tile_px
                            px = ow - (c1 - c0)
                        else:
                            c0, c1, px = 0, min(ow, tile_px), ow + tile_px
                        piece = arr[r0:r1, c0:c1]
                        if (dr or dc) and np.all(np.isnan(piece)):
                            continue  # all-nodata strips carry no information
                        dest = grid.neighbor(int(cid), dr, dc)
                        emit(img, band, dest, role, py, px, piece)

            for r in pdf.itertuples(index=False):
                arr = decode_tile(r.data, r.h, r.w)
                if r.role == "src":
                    # original-res src tile: center-only, for the apply stage
                    emit(r.image_id, r.band, r.cell_id, "src_orig", 0, 0, arr, r.media_ref)
                    if ship_coverage:
                        # plain block-mean of the src-grid mask — the strict
                        # coverage channel for mask_partial (the reference's
                        # mask reproject with average, kernel_model.py:396-399)
                        cov = ops.block_mean(
                            (~np.isnan(arr)).astype(np.float32), (factor, factor)
                        )
                        cov[cov <= 0] = np.nan  # reuse NaN strip elision
                        emit_with_halo(r.image_id, r.band, r.cell_id, "scov", cov)
                    # reproject to proc grid for fitting (block-mean average,
                    # reference RefSpaceModel.fit kernel_model.py:476-482)
                    arr = ops.downsample_average(arr, (factor, factor))
                emit_with_halo(r.image_id, r.band, r.cell_id, r.role, arr)
            yield pd.DataFrame(out)

    return tiles.select(
        "image_id", "band", "cell_id", "role", "h", "w", "media_ref", "data"
    ).mapInPandas(slice_pieces, schema=HALO_PIECE_SCHEMA)


# ---------------------------------------------------------------------------
# stage 3: co-grouped assemble + fit + apply
# ---------------------------------------------------------------------------

def fuse_blocks(pieces: DataFrame, cfg: FuseConfig) -> DataFrame:
    """groupBy (image_id, band, cell_id) → assemble src/ref blocks with halo
    → kernel-model fit on the proc grid → apply to the original src tile.

    This single exchange realizes the reference's BlockPair read
    (``raster_pair.py:313-340``), ``model.fit`` and ``model.apply``
    (``fuse.py:396-401``) — src↔ref pairing included (union + co-group, so
    no second join shuffle).
    """
    tile_px = cfg.tile
    oh, ow = overlap_for_kernel(cfg.params.kernel_shape)
    factor = cfg.factor
    params = cfg.params
    bh, bw = tile_px + 2 * oh, tile_px + 2 * ow
    src_px = tile_px * factor

    def fuse_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        image_id, band, cell_id = key
        blocks = {
            "src": np.full((bh, bw), np.nan, dtype=np.float32),
            "ref": np.full((bh, bw), np.nan, dtype=np.float32),
            "scov": np.full((bh, bw), np.nan, dtype=np.float32),
        }
        src_orig = None
        media_ref = None
        for r in pdf.itertuples(index=False):
            arr = decode_tile(r.data, r.ph, r.pw)
            if r.role == "src_orig":
                src_orig = arr
                media_ref = r.media_ref
            else:
                blocks[r.role][r.py : r.py + r.ph, r.px : r.px + r.pw] = arr

        # exactly-once out-block ownership (reference raster_pair.py:389-427):
        # only the cell that owns a source tile writes output — halo-only
        # groups (strips leaked past the image edge) emit nothing
        if src_orig is None or not (~np.isnan(blocks["src"]) & ~np.isnan(blocks["ref"])).any():
            return pd.DataFrame(columns=[f.name for f in FUSED_TILE_SCHEMA.fields])

        src_b = blocks["src"]
        ref_b = blocks["ref"]
        param = fit_model(src_b, ref_b, params)

        # crop params to the out-block (exactly-once ownership, the engine's
        # src_out_block/ref_out_block adjacency — raster_pair.py:389-427)
        pc = param[:, oh : oh + tile_px, ow : ow + tile_px]

        corr_bytes = None
        n_valid = int(np.count_nonzero(~np.isnan(pc[0])))
        if src_orig is not None:
            param_us = np.stack([
                ops.upsample_nearest(pc[0], (factor, factor)),
                ops.upsample_nearest(pc[1], (factor, factor)),
            ])
            if params.mask_partial:
                # strict coverage (kernel_model.py:375-409): proc pixels whose
                # src coverage fraction is 1, AND param validity, eroded by a
                # k+2 rect SE. Halo radius == erosion radius (ceil(k/2) vs
                # k//2+1, equal for odd k), so the center crop is exact.
                cov_frac = np.nan_to_num(blocks["scov"], nan=0.0)
                mask = (cov_frac >= 1).astype(np.uint8)
                mask &= (~np.isnan(param[0])).astype(np.uint8)
                se = (params.kernel_shape[0] + 2, params.kernel_shape[1] + 2)
                full_cov = ops.erode_rect(mask, se).astype(bool)
                cov_c = full_cov[oh : oh + tile_px, ow : ow + tile_px]
                cov_us = ops.upsample_nearest(cov_c.astype(np.float32), (factor, factor)) >= 0.5
                param_us[:, ~cov_us] = np.nan
            else:
                param_us[:, np.isnan(src_orig)] = np.nan
            corr = apply_model(src_orig, param_us)
            corr_bytes = encode_tile(corr)

        return pd.DataFrame([{
            "image_id": image_id,
            "band": int(band),
            "cell_id": int(cell_id),
            "media_ref": media_ref,
            "h": tile_px,
            "w": tile_px,
            "corr": corr_bytes,
            "gain": encode_tile(pc[0]),
            "offset": encode_tile(pc[1]),
            "r2": encode_tile(pc[2]) if pc.shape[0] > 2 else None,
            "n_valid": n_valid,
        }])

    return pieces.groupBy("image_id", "band", "cell_id").applyInPandas(
        fuse_group, schema=FUSED_TILE_SCHEMA
    )


# ---------------------------------------------------------------------------
# stage 4: document reassembly (span-sequence equality)
# ---------------------------------------------------------------------------

def reassemble_documents(spans: DataFrame) -> DataFrame:
    """Re-collect exploded spans into documents, ordered by offset —
    ``array_sort`` on the struct (offset leads) restores the exact span
    sequence (input_hint invariant; SURVEY.md §1.3)."""
    return spans.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("offset", "kind", "text", "media_ref"))),
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), s["offset"].alias("offset"),
            ),
        ).alias("spans")
    )


# ---------------------------------------------------------------------------
# top-level API (reference RasterFuse.process, fuse.py:321-408)
# ---------------------------------------------------------------------------

def fuse(
    documents: DataFrame,
    tiles: DataFrame,
    model: Model | str = Model.gain_blk_offset,
    kernel_shape: Tuple[int, int] = (5, 5),
    find_r2: bool = False,
    r2_inpaint_thresh: Optional[float] = 0.25,
    mask_partial: bool = False,
    proc_crs: ProcCrs | str = ProcCrs.ref,
    check_coverage: bool = False,
) -> DataFrame:
    """Run the full fuse pipeline; returns the fused-tile DataFrame
    (corrected src tiles + gain/offset/r2 parameter tiles per cell).

    Lazy end-to-end: Catalyst sees scan → join → mapInPandas →
    one hash-partitioned exchange → applyInPandas.
    """
    params = KernelModelParams(
        model=Model(model), kernel_shape=tuple(kernel_shape), find_r2=find_r2,
        r2_inpaint_thresh=r2_inpaint_thresh, mask_partial=mask_partial,
    )
    cfg = infer_fuse_config(tiles, params, ProcCrs(proc_crs))
    used = referenced_tiles(documents, tiles)
    if check_coverage and coverage_audit(used) > 0:
        raise ImageContentError("reference tiles do not cover all source cells")
    pieces = halo_explode(used, cfg)
    return fuse_blocks(pieces, cfg)
