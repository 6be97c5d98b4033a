"""Iceberg-style snapshot/append table store.

No Iceberg runtime jars ship in this sandbox (SURVEY.md §7 note), so
this implements the same transactional semantics behind a thin
interface: immutable parquet data files + a JSON manifest log with
atomic commit (write-tmp + rename) and time-travel reads. The second
implementation of this interface IS implemented — a real Iceberg
catalog twin in ``sources/iceberg_tables.py`` (``_round``-partitioned
tables, snapshot-summary lineage, jar-gated) — the crawl plan only
uses ``append`` / ``read_*`` / ``latest_round`` / ``rollback_to``.

Layout::

    <root>/<table>/data/r=<round>-<uuid>/   (parquet files)
    <root>/<table>/manifest.json            (snapshot log)

Each manifest entry records the round, the data path, row count and
per-partition lineage (partition id -> rows), giving exact resume
from any checkpoint: a restarted crawl reads frontier/seen/hosts at
``latest_round`` and continues.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_path = os.path.join(self.dir, "manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)
        if not os.path.exists(self.manifest_path):
            self._write_manifest({"snapshots": []})

    # -- manifest ------------------------------------------------------

    def _read_manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit

    # -- write ---------------------------------------------------------

    def append(self, df: DataFrame, round_no: int,
               collect_lineage: bool = True,
               bucket_by: Optional[tuple] = None) -> dict:
        """Append one snapshot. Returns the manifest entry (with row
        count + per-partition lineage when requested).

        ``bucket_by=(col, n)`` writes the snapshot as a BUCKETED
        parquet table (repartitioned first so each bucket is ONE
        file, sorted by the bucket column) — the seen-table layout at
        scale: a bucketed scan re-attached via ``read_bucketed``
        joins with NO exchange on this side, so the per-round
        anti-join shuffles only the candidates (PLANS.md seen-table
        design, enacted)."""
        path = os.path.join(
            self.data_dir, f"r={round_no:06d}-{uuid.uuid4().hex[:8]}"
        )
        if bucket_by:
            col, n = bucket_by
            tmp_name = f"snap_{uuid.uuid4().hex[:12]}"
            (
                df.repartition(n, col)
                .write.bucketBy(n, col)
                .sortBy(col)
                .option("path", path)
                .mode("overwrite")
                .saveAsTable(tmp_name)
            )
            # the in-memory catalog entry is session-local scaffolding;
            # the files + manifest carry everything needed to re-attach
            df.sparkSession.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        else:
            df.write.mode("overwrite").parquet(path)
        entry = {"round": round_no, "path": path}
        if bucket_by:
            entry["bucket_by"] = [bucket_by[0], int(bucket_by[1])]
            entry["schema_ddl"] = df.schema.toDDL()
        if collect_lineage:
            spark = df.sparkSession
            written = spark.read.parquet(path)
            lineage = (
                written.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            entry["rows"] = int(sum(r["count"] for r in lineage))
            entry["partitions"] = {
                str(r["pid"]): int(r["count"]) for r in lineage
            }
        manifest = self._read_manifest()
        manifest["snapshots"].append(entry)
        self._write_manifest(manifest)
        return entry

    # -- read ----------------------------------------------------------

    def snapshots(self) -> List[dict]:
        return self._read_manifest()["snapshots"]

    def latest_round(self) -> Optional[int]:
        snaps = self.snapshots()
        return max((s["round"] for s in snaps), default=None)

    def read_round(self, spark: SparkSession, round_no: int) -> Optional[DataFrame]:
        """The snapshot(s) appended at exactly ``round_no``."""
        paths = [s["path"] for s in self.snapshots() if s["round"] == round_no]
        return spark.read.parquet(*paths) if paths else None

    def read_until(self, spark: SparkSession,
                   round_no: Optional[int] = None) -> Optional[DataFrame]:
        """Union of all appends with round <= round_no (time travel);
        all snapshots when round_no is None. This is the read shape of
        accumulating tables (seen / targets / crawl_log / metrics)."""
        paths = [
            s["path"]
            for s in self.snapshots()
            if round_no is None or s["round"] <= round_no
        ]
        return spark.read.parquet(*paths) if paths else None

    def read_since(self, spark: SparkSession,
                   after_round: int) -> Optional[DataFrame]:
        """Union of appends with round > after_round — the 'recent
        deltas' read of a compacted accumulating table."""
        paths = [
            s["path"] for s in self.snapshots()
            if s["round"] > after_round
        ]
        return spark.read.parquet(*paths) if paths else None

    def read_latest(self, spark: SparkSession) -> Optional[DataFrame]:
        """The most recently appended snapshot only — the read shape
        of full-state tables (hosts / parked / jail), where each
        append supersedes the previous one."""
        snaps = self.snapshots()
        if not snaps:
            return None
        return spark.read.parquet(snaps[-1]["path"])

    def read_bucketed(self, spark: SparkSession,
                      table_name: str = None) -> Optional[DataFrame]:
        """Re-attach the latest bucketed snapshot as a bucketed TABLE
        scan (CREATE TABLE ... CLUSTERED BY ... LOCATION — the
        in-memory catalog forgets between sessions, the files don't).
        Joins on the bucket column then need no exchange on this side;
        falls back to ``read_latest`` for non-bucketed snapshots."""
        snaps = self.snapshots()
        if not snaps:
            return None
        last = snaps[-1]
        if "bucket_by" not in last:
            return self.read_latest(spark)
        col, n = last["bucket_by"]
        name = table_name or f"snap_attach_{uuid.uuid4().hex[:12]}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} ({last['schema_ddl']}) USING PARQUET "
            f"CLUSTERED BY ({col}) SORTED BY ({col}) INTO {n} BUCKETS "
            f"LOCATION '{last['path']}'"
        )
        return spark.table(name)

    def rollback_to(self, round_no: int) -> None:
        """Drop manifest entries newer than ``round_no`` (data files
        are left in place, unreachable — Iceberg-style rollback)."""
        manifest = self._read_manifest()
        manifest["snapshots"] = [
            s for s in manifest["snapshots"] if s["round"] <= round_no
        ]
        self._write_manifest(manifest)


class SnapshotStore:
    """A directory of SnapshotTables — the crawl's durable state."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._tables = {}

    def table(self, name: str) -> SnapshotTable:
        if name not in self._tables:
            self._tables[name] = SnapshotTable(self.root, name)
        return self._tables[name]
