"""Audit bench.py's count()-based timing against full materialization.

Round-4 recorded lesson: ``count()`` probes are blind to projection
cost — Catalyst's ColumnPruning can drop computed output columns that
nothing downstream consumes, so ``df.count()`` may time only the scan
(+ joins/aggs/filters, which it cannot prune) and skip the final
projection's expression work. bench.py times every suite query with
``count()`` (kept for round-over-round comparability); this script
measures, per bench query, the same plan under

  (a) ``count()``                — what bench.py records
  (b) ``noop``-format write      — materializes EVERY output column
                                   JVM-side, no sink cost

and prints one JSON line with both walls and the ratio, so
BENCH/BASELINE.md can record which bench numbers carry projection
cost and which don't. Run in the same window back-to-back; query
order alternates (a,b) per query so drift cancels roughly.

Usage: python scripts/bench_probe_audit.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from bench import BENCH_QUERIES, CPUS, host_probe  # noqa: E402
from methanol_web_crawler_spark import entryqueries  # noqa: E402

SF_DIR = (sys.argv[1] if len(sys.argv) > 1
          else os.environ.get("SPARK_GRAFT_SF_DIR",
                              "/root/testdata/sf0.1"))


def main():
    probe_before = host_probe()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    per = {}
    for name in BENCH_QUERIES:
        fn = entryqueries.QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        t_count = time.time() - t0
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        t_noop = time.time() - t0
        per[name] = {
            "count_s": round(t_count, 3),
            "noop_s": round(t_noop, 3),
            "noop_over_count": round(t_noop / t_count, 3)
            if t_count > 0 else None,
        }
    probe_after = host_probe()
    print(json.dumps({
        "metric": "count-vs-noop projection-cost audit",
        "sf_dir": SF_DIR,
        "cpus": int(CPUS),
        "queries": per,
        "probes": {"before": probe_before, "after": probe_after},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
