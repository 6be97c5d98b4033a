#!/usr/bin/env python
"""Minimal reproducer for the sf0.1 bench crawl totals (drift bisect).

Runs exactly bench.py's run_crawl_bench crawl (sf0.1 sizes, seed=42,
max_rounds=12, politeness 0, strict_order False) and prints one line:
    DRIFT fetched=<n> seen=<n> rounds=<r>
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("drift-bisect")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from methanol_web_crawler_spark.config import default_config
    from methanol_web_crawler_spark.plans.crawl import SparkCrawler
    from methanol_web_crawler_spark.sources.synthweb_spark import (
        generate_web_df,
    )

    docs, seeds = generate_web_df(
        spark, 200_000, 500, seed=42, partitions=int(CPUS), n_seeds=500,
    )
    docs = docs.persist()
    docs.count()
    cfg = default_config(robotstxt=True)
    crawler = SparkCrawler(
        spark, docs, cfg, politeness_budget=0,
        strict_order=False, collect_metrics=False, max_rounds=12,
    )
    t0 = time.time()
    stats = crawler.run(seeds)
    print(
        f"DRIFT fetched={stats.fetched} seen={stats.seen} "
        f"rounds={stats.rounds} wall={time.time()-t0:.1f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
