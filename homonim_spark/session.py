"""SparkSession factory with engine defaults.

Tuned for Arrow-batched pandas UDF pipelines over binary tile payloads;
designed for a multi-executor cluster (AQE on, skew-join on) and tested on
``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "homonim-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        # local mode: match cores; on a cluster this is overridden per job
        cores = master.split("[")[-1].rstrip("]")
        shuffle_partitions = int(cores) if cores.isdigit() else 200
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-plan, skew-join splitting, partition coalescing —
        # the north_rule's explicit skew handling rides on this plus salting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast the side that fits (guide §3.1): the default 10 MB
        # threshold misses the engine's dimension tables and vector corpora
        # (e.g. a 20k×64-dim embedding corpus estimates ~11 MB), forcing
        # sort-merge joins whose shuffles dwarf a one-shot broadcast.  64 MB
        # is conservative against the 8 GB broadcast cap and any executor
        # profile that can run this engine's Arrow pipelines; joins whose
        # build side outgrows it (the 100 TB case) degrade gracefully to
        # the shuffled plans.  Parameterised for cluster tuning.
        .config("spark.sql.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
        # Coalescing merges shuffle partitions by BYTES.  The engine's
        # pandas-UDF group stages are CPU-bound per byte and bytes-based
        # coalescing starves cores there (measured 4-6x on the fuse
        # exchange), so those exchanges pin an explicit partition count
        # (partitioning.pinned_repartition), which opts them out.  With the
        # hot exchanges pinned, coalescing is ON for the relational side:
        # metadata-scale shuffles at 4x-cores partitions paid ~3.5x in
        # per-task/per-block overhead (dedup_exact at sf1.0: 2.04 s @128
        # partitions vs 0.58 s @32 — round-6 measurement), exactly the
        # guide §2.2 small-block regime.  parallelismFirst (default true)
        # keeps parallelism near defaultParallelism rather than the 256 MB
        # advisory size; the 64k floor stops over-coalescing of small-byte
        # but CPU-heavy stages (regex profiling: ~0.5 MB/partition).
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
        # Arrow is the only Python<->JVM path the engine uses.
        # Batch size: tile rows are ~40-300 KB of binary payload, so the
        # 10k default (and even 2048) builds multi-hundred-MB Arrow batches
        # that thrash the allocator on both sides of the socket; small-row
        # paths (id pairs, embeddings) instead pay per-batch overhead.
        # Round-6 interleaved A/B at the bench config: the fuse group stage
        # is flat across 256/512/1024 while the LSH verify path is ~20%
        # faster at ≥512 (9k batches → 2.2k), so 512 is the new default —
        # still ≤ tens of MB per batch for the fattest tile rows.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "512"))
        # binary tile payloads make rows heavy; keep file partitions modest
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # event-time semantics (watermarks, NTZ→TIMESTAMP casts,
        # unix_timestamp/unix_micros) must not depend on the host's zone:
        # the DuckDB oracles read the same parquet NTZ values as UTC
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
