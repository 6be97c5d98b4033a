#!/usr/bin/env python
"""spark-submit entry point for a crawl session.

    spark-submit --py-files methanol_web_crawler_spark.zip \
        jobs/crawl.py --docs <parquet path or 'synthetic:N:H'> \
        --seeds http://a.test/ http://b.test/ \
        --state-dir /data/crawl-state --budget 16 --depth-limit 0 \
        [--crawler default|media] [--resume] [--max-rounds N] \
        [--salt-k 8] [--no-strict-order]

Build the zip with:  (cd /root/repo && zip -r methanol_web_crawler_spark.zip
                      methanol_web_crawler_spark)

State lands in Iceberg-style snapshot tables under --state-dir;
re-running with --resume continues exactly from the last snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="parquet path of the docs table, or "
                         "'synthetic:N_DOCS:N_HOSTS' for the generator")
    ap.add_argument("--seeds", nargs="*", default=[])
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--crawler", default="default",
                    choices=["default", "media"])
    ap.add_argument("--budget", type=int, default=None,
                    help="politeness: max fetches per host per round")
    ap.add_argument("--politeness-mode", default="aggressive",
                    choices=["aggressive", "friendly", "coward"],
                    help="reference politeness mode preset "
                         "(overridden by --budget)")
    ap.add_argument("--depth-limit", type=int, default=0)
    ap.add_argument("--max-rounds", type=int, default=10_000)
    ap.add_argument("--salt-k", type=int, default=0,
                    help="two-phase politeness salt for hot hosts")
    ap.add_argument("--no-strict-order", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("methanol-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from methanol_web_crawler_spark.config import (
        default_config,
        media_config,
        politeness_budget_for,
    )
    from methanol_web_crawler_spark.plans.crawl import SparkCrawler

    make_cfg = media_config if args.crawler == "media" else default_config
    cfg = make_cfg(
        robotstxt=True,
        depth_limit=args.depth_limit,
    )

    seeds = list(args.seeds)
    if args.docs.startswith("synthetic:"):
        from methanol_web_crawler_spark.sources.synthweb_spark import (
            generate_web_df,
        )

        _, n_docs, n_hosts = args.docs.split(":")
        docs, gen_seeds = generate_web_df(
            spark, int(n_docs), int(n_hosts),
            partitions=spark.sparkContext.defaultParallelism,
        )
        seeds = seeds or gen_seeds
    else:
        docs = spark.read.parquet(args.docs)

    crawler = SparkCrawler(
        spark,
        docs,
        cfg,
        crawler=cfg.crawlers[0].name,
        politeness_budget=(
            args.budget
            if args.budget is not None
            else politeness_budget_for(args.politeness_mode)
        ),
        strict_order=not args.no_strict_order,
        state_dir=args.state_dir,
        salt_k=args.salt_k,
        max_rounds=args.max_rounds,
    )
    stats = crawler.resume() if args.resume else crawler.run(seeds)
    print(
        json.dumps(
            {
                "rounds": stats.rounds,
                "fetched": stats.fetched,
                "admitted": stats.admitted,
                "targets": stats.targets,
                "seen": stats.seen,
                "wall_s": round(stats.wall_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
