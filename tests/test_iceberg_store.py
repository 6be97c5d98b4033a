"""Iceberg SnapshotStore twin: interface-compat checks.

The real-catalog tests skip when no Iceberg runtime jar is on the
classpath (none ships in this sandbox); the contract tests that CAN
run jar-less verify the gate itself and that both implementations
expose the same surface the crawl plan uses.
"""

import pytest

from methanol_web_crawler_spark.sources.iceberg_tables import (
    IcebergSnapshotStore,
    IcebergSnapshotTable,
    IcebergUnavailable,
    iceberg_available,
)
from methanol_web_crawler_spark.sources.tables import (
    SnapshotStore,
    SnapshotTable,
)

SURFACE = (
    "append", "snapshots", "latest_round", "read_round",
    "read_until", "read_latest", "rollback_to",
)


def test_same_interface():
    """Both implementations expose exactly the methods the crawl plan
    calls (plans/crawl.py uses store.table(name).<method>)."""
    for m in SURFACE:
        assert callable(getattr(SnapshotTable, m))
        assert callable(getattr(IcebergSnapshotTable, m))
    assert callable(SnapshotStore.table)
    assert callable(IcebergSnapshotStore.table)


def test_gate_reports_unconfigured(spark):
    assert not iceberg_available(spark, "no_such_catalog")


def test_store_raises_without_jars(spark):
    with pytest.raises(IcebergUnavailable):
        IcebergSnapshotStore(spark, "no_such_catalog", "ns")


def test_roundtrip_with_catalog(spark):
    """Runs only where an Iceberg catalog named 'crawl' is configured
    AND its jar loads (skip otherwise — none ships in this sandbox)."""
    if not iceberg_available(spark, "crawl"):
        pytest.skip("no loadable Iceberg catalog 'crawl' here")
    store = IcebergSnapshotStore(spark, "crawl", "t")
    t = store.table("metrics")
    df = spark.range(5).withColumnRenamed("id", "n")
    t.append(df, 0)
    t.append(df, 1)
    assert t.latest_round() == 1
    assert t.read_until(spark, 0).count() == 5
    assert t.read_until(spark).count() == 10
    t.rollback_to(0)
    assert t.latest_round() == 0
