#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: N -> 4N executors at
≥0.8 throughput scaling efficiency, evidenced in-sandbox as local[8]
vs local[32] on identical input).

Runs the same crawl at both parallelism levels, reports throughput
(URLs fetched+deduped per second) at each and the scaling efficiency
 = (throughput@32 / throughput@8) / 4, appending BENCH/BASELINE.md.

Usage: python bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
LEVELS = (8, 32)


def run_at(cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    bench.CPUS = str(cpus)
    spark = bench.make_spark(str(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        res = bench.run_crawl_bench(spark, SF_DIR)
    finally:
        spark.stop()
    res["cpus"] = cpus
    return res


def main():
    results = [run_at(c) for c in LEVELS]
    r8, r32 = results
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / (
        LEVELS[1] / LEVELS[0]
    )
    out = {
        "sf_dir": SF_DIR,
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8 per BASELINE.json north_rule "
        "(local[8] vs local[32] stand-in for N vs 4N executors)",
        "passes": eff >= 0.8,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run ({SF_DIR})\n\n"
            "| cores | wall s | URLs fetched | URLs seen | URLs/s |\n"
            "|---|---|---|---|---|\n"
        )
        for r in results:
            f.write(
                f"| {r['cpus']} | {r['wall_sec']} | {r['urls_fetched']} "
                f"| {r['urls_seen']} | {r['urls_per_sec']} |\n"
            )
        f.write(
            f"\nscaling efficiency (T@8→T@32 normalized by 4x cores): "
            f"**{eff:.3f}** — "
            f"{'PASS' if eff >= 0.8 else 'BELOW'} the ≥0.8 criterion.\n"
        )


if __name__ == "__main__":
    main()
