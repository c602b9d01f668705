"""Deterministic synthetic data: interleaved text+media documents + tile payloads.

Per ``BASELINE.json.input_hint`` the engine's source of truth is a table of
interleaved text + media documents::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Media spans reference raster tiles in a companion payload table (FIXTURES.md §1).
Pixel patterns come from the reference's test fixtures so expected values are
closed-form: the gradient ``value = 1 + ((row*10 + col) % 200)``
(``/root/reference/tests/conftest.py:74-81``), the source image a Kronecker
2× upsample of it (``conftest.py:83-89``), scaled by a known true gain/offset
so that model fits have known answers.

Everything is seeded — no wall-clock, no external data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from homonim_spark import grid
from homonim_spark.tiles import encode_tile

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ])), False),
])

TILES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("image_id", T.StringType(), False),
    T.StructField("role", T.StringType(), False),       # 'src' | 'ref'
    T.StructField("band", T.IntegerType(), False),
    T.StructField("cell_id", T.LongType(), False),
    T.StructField("row", T.IntegerType(), False),
    T.StructField("col", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("transform", T.ArrayType(T.DoubleType()), False),
    T.StructField("data", T.BinaryType(), False),
])

#: grid resolution used by all synthetic fixtures
FIXTURE_RES = 10

_TEXT_WORDS = (
    "survey flight mosaic reflectance calibration kernel gain offset tile "
    "raster band landsat sentinel drone aerial footprint ortho scene"
).split()


@dataclass(frozen=True)
class RasterFixtureSpec:
    """One synthetic src/ref image pair on the canonical grid.

    ``cells`` = (rows, cols) of proc-grid (reference-resolution) cells;
    ``tile`` = ref pixels per cell per dim; ``factor`` = src pixels per ref
    pixel (the 2× of ``conftest.py:83-89``); ``true_gain``/``true_offset``
    relate ref to src: ``ref ≈ true_gain·src + true_offset`` so kernel fits
    have closed-form expectations.
    """

    pair_id: str = "pair0"
    cells: Tuple[int, int] = (4, 4)
    tile: int = 16
    factor: int = 2
    bands: int = 1
    true_gain: float = 1.0
    true_offset: float = 0.0
    origin: Tuple[int, int] = (0, 0)  # cell (row, col) of the image's UL cell
    nan_border_ref: int = 1           # conftest.py:74-81 — 1-px nodata border
    nan_border_src: int = 2           # conftest.py:83-89 — 2-px nodata border
    outlier: bool = False             # plant a -100 outlier (test_kernel_model.py:171-179)


def gradient_image(h: int, w: int, band: int = 0) -> np.ndarray:
    """Periodic extension of the conftest gradient: 1 + ((r*10 + c) % 200),
    scaled by (band+1) for multi-band fixtures (``conftest.py:351-374``)."""
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return ((band + 1) * (1.0 + ((r * 10 + c) % 200))).astype(np.float32)


def make_pair_arrays(spec: RasterFixtureSpec, band: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full-image (ref_array, src_array) for one band, NaN borders applied."""
    ch, cw = spec.cells
    rh, rw = ch * spec.tile, cw * spec.tile
    ref = gradient_image(rh, rw, band)
    src = np.kron(ref, np.ones((spec.factor, spec.factor), dtype=np.float32))
    # invert the relation ref = g·src + o  →  src = (ref − o)/g
    src = ((src - spec.true_offset) / spec.true_gain).astype(np.float32)
    if spec.outlier:
        src[src.shape[0] // 2, src.shape[1] // 2] = -100.0
    b = spec.nan_border_ref
    if b:
        ref[:b] = np.nan; ref[-b:] = np.nan; ref[:, :b] = np.nan; ref[:, -b:] = np.nan
    b = spec.nan_border_src
    if b:
        src[:b] = np.nan; src[-b:] = np.nan; src[:, :b] = np.nan; src[:, -b:] = np.nan
    return ref, src


def media_ref_str(pair_id: str, role: str, band: int, row: int, col: int) -> str:
    return f"tile://{pair_id}/{role}/{band}/{row}/{col}"


def build_pair_tables(spec: RasterFixtureSpec, seed: int = 42) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """(documents_pdf, tiles_pdf) for one image pair.

    Documents interleave text and media spans (pattern text, media, media,
    text, … from a seeded RNG — FIXTURES.md §1); one document per
    (band, cell-row) holding that row's src and ref tiles as media spans.
    """
    rng = np.random.default_rng(seed + hash(spec.pair_id) % (2 ** 16))
    ch, cw = spec.cells
    trow0, tcol0 = spec.origin
    px_ref = grid.cell_size(FIXTURE_RES) / spec.tile
    px_src = px_ref / spec.factor

    tile_rows: List[dict] = []
    doc_rows: List[dict] = []

    per_band = {}
    for band in range(spec.bands):
        per_band[band] = make_pair_arrays(spec, band)

    for band in range(spec.bands):
        ref_img, src_img = per_band[band]
        for cr in range(ch):
            spans: List[dict] = []
            offset = 0

            def add_text():
                nonlocal offset
                n = int(rng.integers(3, 9))
                words = [_TEXT_WORDS[int(i)] for i in rng.integers(0, len(_TEXT_WORDS), n)]
                spans.append({"kind": "text", "text": " ".join(words), "media_ref": "", "offset": offset})
                offset += 1

            add_text()
            for cc in range(cw):
                for role, img, t in (("ref", ref_img, spec.tile), ("src", src_img, spec.tile * spec.factor)):
                    arr = img[cr * t : (cr + 1) * t, cc * t : (cc + 1) * t]
                    mref = media_ref_str(spec.pair_id, role, band, cr, cc)
                    cid = grid.cell_id(FIXTURE_RES, trow0 + cr, tcol0 + cc)
                    px = px_ref if role == "ref" else px_src
                    x0 = (tcol0 + cc) * grid.cell_size(FIXTURE_RES)
                    y0 = (trow0 + cr) * grid.cell_size(FIXTURE_RES)
                    tile_rows.append({
                        "media_ref": mref, "image_id": spec.pair_id, "role": role,
                        "band": band, "cell_id": cid, "row": trow0 + cr, "col": tcol0 + cc,
                        "h": t, "w": t,
                        "transform": [px, 0.0, x0, 0.0, px, y0],
                        "data": encode_tile(arr),
                    })
                    spans.append({"kind": "media", "text": "", "media_ref": mref, "offset": offset})
                    offset += 1
                if rng.random() < 0.5:
                    add_text()
            add_text()
            doc_rows.append({"doc_id": f"doc-{spec.pair_id}-b{band}-r{cr:04d}", "spans": spans})

    return pd.DataFrame(doc_rows), pd.DataFrame(tile_rows)


def build_fixture_tables(
    specs: List[RasterFixtureSpec], seed: int = 42
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    docs, tiles = [], []
    for spec in specs:
        d, t = build_pair_tables(spec, seed=seed)
        docs.append(d)
        tiles.append(t)
    return pd.concat(docs, ignore_index=True), pd.concat(tiles, ignore_index=True)


def to_spark(
    spark: SparkSession, docs_pdf: pd.DataFrame, tiles_pdf: pd.DataFrame,
    partitions: Optional[int] = None,
) -> Tuple[DataFrame, DataFrame]:
    docs = spark.createDataFrame(docs_pdf, schema=DOCUMENTS_SCHEMA)
    tiles = spark.createDataFrame(tiles_pdf, schema=TILES_SCHEMA)
    if partitions:
        docs = docs.repartition(partitions, "doc_id")
        tiles = tiles.repartition(partitions, "cell_id")
    return docs, tiles


def default_specs(scale: int = 1, bands: int = 1, tile: int = 16) -> List[RasterFixtureSpec]:
    """A deterministic family of image pairs; ``scale`` multiplies the cell
    count (used by bench.py to grow input size without changing semantics)."""
    specs = []
    for i in range(max(1, scale)):
        specs.append(RasterFixtureSpec(
            pair_id=f"pair{i}",
            cells=(4, 4),
            tile=tile,
            bands=bands,
            true_gain=1.0 + 0.25 * (i % 4),
            true_offset=float(2 * (i % 3)),
            origin=(8 * (i // 16), 8 * (i % 16)),
        ))
    return specs


# --- distributed generation (bench scale — no driver bottleneck) -----------

def distributed_fixture(
    spark: SparkSession,
    n_pairs: int,
    cells: Tuple[int, int] = (4, 4),
    tile: int = 16,
    factor: int = 2,
    bands: int = 1,
    seed: int = 42,
    partitions: Optional[int] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Generate the documents + tiles tables **in executors** — one task
    per (pair, band, cell-row) work unit, everything derived closed-form
    from the unit index (deterministic under any partitioning).

    Pixel content matches the driver-side generator's gradients; document
    text/interleaving uses a per-unit seeded RNG (so the distributed corpus
    is deterministic but not byte-identical to ``build_pair_tables`` — use
    that one for golden tests, this one for scale benchmarks).
    """
    ch, cw = cells
    n_units = n_pairs * bands * ch
    parts = partitions or max(32, n_units // 8)
    units = spark.range(0, n_units, 1, parts)
    px_ref = grid.cell_size(FIXTURE_RES) / tile

    def gen_tiles(batches):
        for pdf in batches:
            out = {f.name: [] for f in TILES_SCHEMA.fields}
            for uid in pdf["id"]:
                uid = int(uid)
                cr = uid % ch
                band = (uid // ch) % bands
                pi = uid // (ch * bands)
                spec = RasterFixtureSpec(
                    pair_id=f"pair{pi}", cells=cells, tile=tile, factor=factor,
                    bands=bands, true_gain=1.0 + 0.25 * (pi % 4),
                    true_offset=float(2 * (pi % 3)),
                    origin=(8 * (pi // 4096), 8 * (pi % 4096)),
                )
                trow0, tcol0 = spec.origin
                # generate only this cell-row strip of the pair (closed form)
                ref_img, src_img = make_pair_arrays(spec, band)
                for cc in range(cw):
                    for role, img, t in (("ref", ref_img, tile), ("src", src_img, tile * factor)):
                        arr = img[cr * t : (cr + 1) * t, cc * t : (cc + 1) * t]
                        px = px_ref if role == "ref" else px_ref / factor
                        out["media_ref"].append(media_ref_str(spec.pair_id, role, band, cr, cc))
                        out["image_id"].append(spec.pair_id)
                        out["role"].append(role)
                        out["band"].append(band)
                        out["cell_id"].append(grid.cell_id(FIXTURE_RES, trow0 + cr, tcol0 + cc))
                        out["row"].append(trow0 + cr)
                        out["col"].append(tcol0 + cc)
                        out["h"].append(t)
                        out["w"].append(t)
                        out["transform"].append([px, 0.0,
                                                 (tcol0 + cc) * grid.cell_size(FIXTURE_RES),
                                                 0.0, px,
                                                 (trow0 + cr) * grid.cell_size(FIXTURE_RES)])
                        out["data"].append(encode_tile(arr))
            yield pd.DataFrame(out)

    def gen_docs(batches):
        for pdf in batches:
            rows = []
            for uid in pdf["id"]:
                uid = int(uid)
                cr = uid % ch
                band = (uid // ch) % bands
                pi = uid // (ch * bands)
                rng = np.random.default_rng([seed, pi, band, cr])
                pair_id = f"pair{pi}"
                spans = []
                offset = 0

                def add_text():
                    nonlocal offset
                    n = int(rng.integers(3, 9))
                    words = [_TEXT_WORDS[int(i)] for i in rng.integers(0, len(_TEXT_WORDS), n)]
                    spans.append({"kind": "text", "text": " ".join(words),
                                  "media_ref": "", "offset": offset})
                    offset += 1

                add_text()
                for cc in range(cw):
                    for role in ("ref", "src"):
                        spans.append({"kind": "media", "text": "",
                                      "media_ref": media_ref_str(pair_id, role, band, cr, cc),
                                      "offset": offset})
                        offset += 1
                    if rng.random() < 0.5:
                        add_text()
                add_text()
                rows.append({"doc_id": f"doc-{pair_id}-b{band}-r{cr:04d}", "spans": spans})
            yield pd.DataFrame(rows)

    tiles = units.mapInPandas(gen_tiles, schema=TILES_SCHEMA)
    docs = units.mapInPandas(gen_docs, schema=DOCUMENTS_SCHEMA)
    return docs, tiles


# --- block-norm oracle fixture ----------------------------------------------

#: per-cell (src_low, true_gain, true_offset) for the gain-blk-offset oracle
#: fixture; the two-value gap d is 2 throughout.  Values chosen so every
#: float32 intermediate of the block-norm fit is EXACT (see
#: ``build_blknorm_tables``).
BLKNORM_CELL_PARAMS = ((4.0, 2.0, 3.0), (6.0, 0.5, -1.0),
                       (8.0, 1.5, 0.5), (10.0, 2.5, 2.0))


def build_blknorm_tables(
    pair_id: str = "blk", tile: int = 16, border: int = 3,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """2×2-cell src/ref pair designed so the gain-blk-offset fit
    (``kernel/models.py:fit_gain_blk_offset``, reference
    ``/root/reference/homonim/kernel_model.py:216-229,276-303``) is EXACT in
    float32 and therefore reproducible bit-for-bit by a float64 DuckDB
    rebuild:

    - Each cell's valid pixels are a two-value checkerboard ``{a, a+2}``
      with equal counts (interior 10×10 → 50/50), so ``np.std`` is exactly
      ``d/2 = 1`` (mean ``a+1`` is representable → correctly-rounded
      division returns it exactly; deviations are ±1) and the 1st
      percentile is exactly the low value (index 0.99 interpolates between
      two copies of ``a``).
    - ``ref = G·src + C`` pointwise with small dyadic ``G``/``C``, so the
      normalised source equals the reference bit-for-bit and the sliding
      gain fit is exactly 1.0 → folded params are exactly ``(G, C)``.
    - Each tile carries a ``border``-px NaN ring ≥ the 5×5 kernel halo
      (ceil(5/2)=3), so with ``chunk=1`` every chunk's valid data is its own
      cell's pattern only — per-chunk block-norm scoping is pinned (mixing
      chunks would change the std ratio).
    """
    cells = 2
    interior = tile - 2 * border
    assert interior % 2 == 0, "interior must be even for exact 50/50 counts"
    tile_rows: List[dict] = []
    doc_rows: List[dict] = []
    px_sz = grid.cell_size(FIXTURE_RES) / tile
    y, x = np.mgrid[0:tile, 0:tile]
    interior_mask = ((y >= border) & (y <= tile - border - 1)
                     & (x >= border) & (x <= tile - border - 1))
    checker = ((y + x) % 2).astype(np.float32)

    for cr in range(cells):
        spans: List[dict] = []
        offset = 0
        for cc in range(cells):
            a, g, c = BLKNORM_CELL_PARAMS[2 * cr + cc]
            src = np.where(interior_mask, np.float32(a) + 2.0 * checker,
                           np.nan).astype(np.float32)
            ref = (np.float32(g) * src + np.float32(c)).astype(np.float32)
            cid = grid.cell_id(FIXTURE_RES, cr, cc)
            for role, arr in (("ref", ref), ("src", src)):
                mref = media_ref_str(pair_id, role, 0, cr, cc)
                tile_rows.append({
                    "media_ref": mref, "image_id": pair_id, "role": role,
                    "band": 0, "cell_id": cid, "row": cr, "col": cc,
                    "h": tile, "w": tile,
                    "transform": [px_sz, 0.0, cc * grid.cell_size(FIXTURE_RES),
                                  0.0, px_sz, cr * grid.cell_size(FIXTURE_RES)],
                    "data": encode_tile(arr),
                })
                spans.append({"kind": "media", "text": "", "media_ref": mref,
                              "offset": offset})
                offset += 1
        doc_rows.append({"doc_id": f"doc-{pair_id}-r{cr:04d}", "spans": spans})
    return pd.DataFrame(doc_rows), pd.DataFrame(tile_rows)


# --- spatial fixtures (FIXTURES.md §3) -------------------------------------

def build_footprints(n: int = 8, res: int = FIXTURE_RES, seed: int = 42) -> pd.DataFrame:
    """Deterministic irregular flight-footprint polygons: seeded vertex
    jitter around rectangles in cell-grid coordinates."""
    rng = np.random.default_rng(seed)
    s = grid.cell_size(res)
    rows = []
    for i in range(n):
        # ranges chosen to overlap the default_specs fixture cells
        # (rows 0..8, cols 0..16·8)
        r0 = float(rng.integers(0, 4)) * s
        c0 = float(rng.integers(0, 12)) * s
        hh = float(rng.integers(2, 5)) * s
        ww = float(rng.integers(2, 6)) * s
        base = [(c0, r0), (c0 + ww, r0), (c0 + ww, r0 + hh), (c0, r0 + hh)]
        ring = []
        for (x, y) in base:
            ring.append({"x": x + float(rng.uniform(-0.3, 0.3)) * s,
                         "y": y + float(rng.uniform(-0.3, 0.3)) * s})
        rows.append({"footprint_id": f"fp-{i:03d}", "polygon": ring})
    return pd.DataFrame(rows)
