#!/usr/bin/env python
"""Full mega-round under a given admission mode with event-log stage
profiling: prints the top stages by executor run time."""
import glob
import json
import os
import shutil
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "jvm"
if mode == "scalar":
    os.environ["METHANOL_RESOLVER"] = "scalar"
elif mode == "jvm-py":
    os.environ["METHANOL_RESOLVER"] = "jvm"
    os.environ["METHANOL_JVM_ADMIT"] = "0"
else:
    os.environ["METHANOL_RESOLVER"] = "jvm"
    os.environ["METHANOL_JVM_ADMIT"] = "1"

sys.argv = ["prof_round"]
sys.path.insert(0, "/root/repo")
import bench_scaling as B  # noqa: E402

B.N_DOCS, B.N_HOSTS, B.FRONTIER_EVERY = 24_000_000, 24_000, 3
docs_path, frontier_path = B.materialize_inputs()

LOG_DIR = "/dev/shm/spark-evt"
shutil.rmtree(LOG_DIR, ignore_errors=True)
os.makedirs(LOG_DIR, exist_ok=True)

from methanol_web_crawler_spark.config import default_config  # noqa
from methanol_web_crawler_spark.plans.crawl import SparkCrawler  # noqa

spark = B.make_spark(8, {
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": LOG_DIR,
})
spark.sparkContext.setLogLevel("ERROR")
docs = B.register_bucketed_docs(spark, docs_path)
docs.count()
frontier = spark.read.parquet(frontier_path).persist()
frontier.count()
cfg = default_config(robotstxt=True)
crawler = SparkCrawler(
    spark, docs, cfg, politeness_budget=0,
    strict_order=False, collect_metrics=False, max_rounds=1,
)
t0 = time.time()
stats = crawler.run_frontier(frontier)
wall = time.time() - t0
print(f"PROF {mode} wall={wall:.1f} fetched={stats.fetched} "
      f"seen={stats.seen}", flush=True)
spark.stop()

stages = {}
for path in glob.glob(f"{LOG_DIR}/*"):
    for line in open(path, errors="replace"):
        if '"Event":"SparkListenerStageCompleted"' not in line:
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        si = ev["Stage Info"]
        sid = si["Stage ID"]
        sub = si.get("Submission Time")
        comp = si.get("Completion Time")
        dur = (comp - sub) / 1000.0 if sub and comp else 0.0
        name = si.get("Stage Name", "")[:90]
        stages[sid] = (dur, si.get("Number of Tasks"), name)
for sid, (dur, ntasks, name) in sorted(
    stages.items(), key=lambda kv: -kv[1][0]
)[:15]:
    print(f"STAGE {sid} {dur:8.1f}s tasks={ntasks} {name}")
