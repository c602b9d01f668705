"""Lakehouse table layer: Iceberg when available, parquet snapshots otherwise.

The engine's tables (``documents``, ``tiles``, ``corrected``, ``params``,
``metrics``) are designed to live in an Iceberg catalog (north_rule /
SURVEY.md §1.3): writes go through ``df.writeTo(ident).using('iceberg')``,
run metadata rides as snapshot summary properties (the analogue of the
reference's ``FUSE_*`` GTiff tags, ``/root/reference/homonim/fuse.py:193-207``),
and checkpoint resume reads a named snapshot (``VERSION AS OF``).

This sandbox ships no Iceberg runtime jar, so :class:`TableCatalog` detects
whether an Iceberg catalog is configured on the session and otherwise falls
back to a parquet warehouse that preserves the *semantics* the engine relies
on — append vs replace, immutable numbered snapshots, time-travel reads, and
per-snapshot properties — so every caller is written once against the
Iceberg-shaped API:

- append     → new ``snap-NNNNNN`` directory; reads union all live snapshots
- replace    → new snapshot that shadows all earlier ones
- time travel → ``read(table, as_of=snapshot_id)`` reconstructs the view as
  of that snapshot from the append/replace log
- properties → recorded per snapshot in ``_snapshots.json`` (atomic rename)

On a real cluster, pass ``catalog='my_iceberg_catalog'`` (configured via
``spark.sql.catalog.*`` conf) and the same calls become native Iceberg DDL.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class TableCatalog:
    def __init__(self, spark: SparkSession, warehouse: str,
                 catalog: Optional[str] = None):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog = catalog
        if catalog is not None:
            # an Iceberg catalog must be configured on the session
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
            if not impl:
                raise ValueError(
                    f"catalog '{catalog}' is not configured "
                    f"(spark.sql.catalog.{catalog} unset) — omit it to use "
                    "the parquet-snapshot warehouse"
                )

    # -- Iceberg path --------------------------------------------------------

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{table}"

    # -- parquet-snapshot fallback -------------------------------------------

    def _tdir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _log_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_snapshots.json")

    def _log(self, table: str) -> list[dict]:
        p = self._log_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _append_log(self, table: str, entry: dict) -> None:
        entries = self._log(table) + [entry]
        d = self._tdir(table)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, self._log_path(table))  # atomic commit

    # -- public API ------------------------------------------------------------

    def write(self, df: DataFrame, table: str, mode: str = "append",
              properties: Optional[dict] = None) -> int:
        """Write ``df`` to ``table``; returns the new snapshot id.

        ``mode``: ``append`` or ``replace`` (Iceberg ``createOrReplace``).
        ``properties`` become snapshot summary properties.
        """
        if mode not in ("append", "replace"):
            raise ValueError(f"mode must be append|replace, got {mode!r}")
        if self.catalog is not None:
            ident = self._ident(table)
            w = df.writeTo(ident).using("iceberg")
            # Per-commit run metadata (FUSE_* tag analogue) must ride the
            # *snapshot summary*, not table properties — tableProperty only
            # applies at table creation and is silently dropped on append.
            for k, v in (properties or {}).items():
                w = w.option(f"snapshot-property.{k}", str(v))
            if mode == "append":
                # explicit existence check: a failed append (schema mismatch,
                # commit conflict) must propagate, not be masked by create()
                if self.spark.catalog.tableExists(ident):
                    w.append()
                else:
                    w.create()
            else:
                w.createOrReplace()
            snaps = self.snapshots(table)
            return snaps[-1]["snapshot_id"] if snaps else 0
        log = self._log(table)
        snap_id = (log[-1]["snapshot_id"] + 1) if log else 1
        path = os.path.join(self._tdir(table), f"snap-{snap_id:06d}")
        df.write.mode("errorifexists").parquet(path)
        self._append_log(table, {
            "snapshot_id": snap_id,
            "mode": mode,
            "path": path,
            "committed_at": time.time(),
            "properties": dict(properties or {}),
        })
        return snap_id

    def read(self, table: str, as_of: Optional[int] = None) -> DataFrame:
        """Read ``table``, optionally time-travelling to snapshot ``as_of``."""
        if self.catalog is not None:
            ident = self._ident(table)
            if as_of is not None:
                return self.spark.read.option("snapshot-id", as_of) \
                    .format("iceberg").load(ident)
            return self.spark.read.format("iceberg").load(ident)
        log = self._log(table)
        if as_of is not None:
            log = [e for e in log if e["snapshot_id"] <= as_of]
        if not log:
            raise FileNotFoundError(f"table '{table}' has no snapshots"
                                    + (f" at or before {as_of}" if as_of else ""))
        # view as of the last entry: everything since the latest replace
        live: list[str] = []
        for e in log:
            if e["mode"] == "replace":
                live = [e["path"]]
            else:
                live.append(e["path"])
        return self.spark.read.parquet(*live)

    def snapshots(self, table: str) -> list[dict]:
        """Snapshot log (id, mode, committed_at, properties), oldest first."""
        if self.catalog is not None:
            # missing table → empty log on both backends (first pipeline run
            # against a fresh catalog must start clean, not crash in resume)
            if not self.spark.catalog.tableExists(self._ident(table)):
                return []
            # normalized to the fallback schema (operation→mode, summary map
            # → properties) so checkpoint-resume callers work on both backends
            # (ordered by (committed_at, snapshot_id): committed_at has ms
            # granularity, so rapid commits can tie — the id breaks the tie
            # deterministically)
            rows = self.spark.sql(
                f"SELECT snapshot_id, committed_at, operation, summary "
                f"FROM {self._ident(table)}.snapshots "
                f"ORDER BY committed_at, snapshot_id"
            ).collect()
            return [{
                "snapshot_id": r["snapshot_id"],
                "mode": "replace" if r["operation"] in ("overwrite", "replace")
                        else "append",
                "committed_at": r["committed_at"],
                "properties": dict(r["summary"] or {}),
            } for r in rows]
        return [{k: e[k] for k in
                 ("snapshot_id", "mode", "committed_at", "properties")}
                for e in self._log(table)]

    def latest_snapshot(self, table: str) -> Optional[int]:
        snaps = self.snapshots(table)
        return snaps[-1]["snapshot_id"] if snaps else None
