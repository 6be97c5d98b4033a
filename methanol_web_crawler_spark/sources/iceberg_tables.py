"""Iceberg-catalog implementation of the SnapshotStore interface.

The crawl plan only touches ``store.table(name)`` and the table's
``append / snapshots / latest_round / read_round / read_until /
read_latest / rollback_to`` — the contract established by
sources/tables.py (the jar-less parquet+manifest twin). This module is
the "second implementation" over a real Iceberg catalog
(``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``):

- every logical table becomes an Iceberg table carrying a ``_round``
  column; ``append`` is a transactional ``writeTo(...).append()``
  (Iceberg snapshot commit = the manifest.json atomic rename of the
  parquet twin);
- ``read_until`` / ``read_round`` / ``read_latest`` are partition-
  pruned ``_round`` filters (the table is partitioned by ``_round``,
  so time travel reads only its rounds' data files);
- ``rollback_to`` deletes rounds newer than the target (Iceberg
  row-level delete; the engine-facing effect matches the manifest
  truncation of the parquet twin);
- row-count lineage comes from the commit's snapshot summary
  (``added-records``) instead of a read-back.

No Iceberg runtime jar ships in this sandbox, so construction raises
``IcebergUnavailable`` unless the catalog class is on the session's
classpath; tests gate on ``iceberg_available`` (skipif). On a real
cluster: ``spark-submit --packages org.apache.iceberg:iceberg-spark-
runtime-<ver> --conf spark.sql.catalog.crawl=org.apache.iceberg.spark
.SparkCatalog --conf spark.sql.catalog.crawl.type=hadoop --conf
spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse`` and pass
``IcebergSnapshotStore(spark, "crawl", "crawl_state")`` where the
parquet twin took a directory path.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IcebergUnavailable(RuntimeError):
    pass


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True when ``catalog`` is configured AND the Iceberg Spark
    catalog class loads in this JVM."""
    conf = spark.conf
    try:
        impl = conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


class IcebergSnapshotTable:
    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str, name: str):
        self.spark = spark
        self.ident = f"{catalog}.{namespace}.{name}"
        self._exists = None

    # -- helpers -------------------------------------------------------

    def _table_exists(self) -> bool:
        if self._exists:
            return True
        self._exists = self.spark.catalog.tableExists(self.ident)
        return self._exists

    # -- write ---------------------------------------------------------

    def append(self, df: DataFrame, round_no: int,
               collect_lineage: bool = True) -> dict:
        stamped = df.withColumn("_round", F.lit(int(round_no)))
        if not self._table_exists():
            # partitioned by _round: read_until/read_round prune files
            (
                stamped.writeTo(self.ident)
                .partitionedBy("_round")
                .create()
            )
            self._exists = True
        else:
            stamped.writeTo(self.ident).append()
        entry = {"round": round_no, "path": self.ident}
        if collect_lineage:
            # the commit's own summary, no data read-back
            last = (
                self.spark.sql(
                    f"SELECT summary FROM {self.ident}.snapshots "
                    "ORDER BY committed_at DESC LIMIT 1"
                ).collect()
            )
            if last:
                summary = last[0]["summary"]
                entry["rows"] = int(summary.get("added-records", 0))
        return entry

    # -- read ----------------------------------------------------------

    def snapshots(self) -> List[dict]:
        if not self._table_exists():
            return []
        rows = (
            self.spark.table(self.ident)
            .select("_round").distinct().collect()
        )
        return [
            {"round": int(r["_round"]), "path": self.ident}
            for r in sorted(rows, key=lambda r: r["_round"])
        ]

    def latest_round(self) -> Optional[int]:
        if not self._table_exists():
            return None
        row = self.spark.table(self.ident).agg(
            F.max("_round").alias("m")
        ).first()
        return int(row["m"]) if row["m"] is not None else None

    def read_round(self, spark: SparkSession,
                   round_no: int) -> Optional[DataFrame]:
        if not self._table_exists():
            return None
        df = spark.table(self.ident).filter(
            F.col("_round") == round_no
        )
        return df.drop("_round") if df.limit(1).count() else None

    def read_until(self, spark: SparkSession,
                   round_no: Optional[int] = None) -> Optional[DataFrame]:
        if not self._table_exists():
            return None
        df = spark.table(self.ident)
        if round_no is not None:
            df = df.filter(F.col("_round") <= round_no)
        return df.drop("_round") if df.limit(1).count() else None

    def read_latest(self, spark: SparkSession) -> Optional[DataFrame]:
        last = self.latest_round()
        if last is None:
            return None
        return self.read_round(spark, last)

    def rollback_to(self, round_no: int) -> None:
        if self._table_exists():
            self.spark.sql(
                f"DELETE FROM {self.ident} WHERE _round > {int(round_no)}"
            )


class IcebergSnapshotStore:
    """Drop-in for SnapshotStore over an Iceberg catalog namespace."""

    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str):
        if not iceberg_available(spark, catalog):
            raise IcebergUnavailable(
                f"catalog '{catalog}' is not configured with a loadable"
                " Iceberg implementation in this session"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}"
        )
        self._tables = {}

    def table(self, name: str) -> IcebergSnapshotTable:
        if name not in self._tables:
            self._tables[name] = IcebergSnapshotTable(
                self.spark, self.catalog, self.namespace, name
            )
        return self._tables[name]
