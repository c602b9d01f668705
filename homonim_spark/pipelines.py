"""Staged, checkpoint-resumable end-to-end pipelines.

Wires the fuse dataflow through :class:`homonim_spark.lineage.StageRunner`:
each stage lands in parquet with a config-fingerprinted manifest and
per-partition lineage metrics; re-running a completed stage is a checkpoint
read (north_rule: resumable from checkpoint with per-partition lineage +
metrics).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from homonim_spark.lineage import StageRunner


def staged_fuse_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    tiles: DataFrame,
    run_dir: str,
    model: str = "gain-blk-offset",
    kernel_shape: Tuple[int, int] = (5, 5),
    dtype: str = "float32",
    nodata: Optional[float] = None,
    **fuse_kwargs,
) -> dict:
    """ingest-audit → fuse → corrected sink → param stats, each a resumable
    stage. Returns {stage: DataFrame} plus the runner for metrics access."""
    from homonim_spark.operators import fuse as fz
    from homonim_spark.operators.sink import convert_tiles
    from homonim_spark.operators.stats import param_stats

    runner = StageRunner(spark, run_dir)
    cfg = {"model": model, "kernel": tuple(kernel_shape), **{
        k: str(v) for k, v in fuse_kwargs.items()}}

    used = runner.run("ingest", cfg, lambda: fz.referenced_tiles(documents, tiles))
    fused = runner.run("fuse", cfg, lambda: fz.fuse(
        documents, used, model=model, kernel_shape=kernel_shape, **fuse_kwargs))
    corrected = runner.run("sink", {**cfg, "dtype": dtype, "nodata": nodata},
                           lambda: convert_tiles(fused, "corr", dtype, nodata,
                                                 scale_h=_factor(used)))
    stats = runner.run("stats", cfg, lambda: param_stats(fused, model=model))
    return {"ingest": used, "fuse": fused, "sink": corrected,
            "stats": stats, "runner": runner}


def _factor(tiles: DataFrame) -> int:
    from pyspark.sql import functions as F
    sizes = {r["role"]: r["h"] for r in
             tiles.groupBy("role").agg(F.max("h").alias("h")).collect()}
    return int(sizes.get("src", sizes["ref"])) // int(sizes["ref"])
