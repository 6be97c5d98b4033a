#!/usr/bin/env python
"""Profile one mega-round at one parallelism level with event logging.

Usage: python prof_scaling.py <cpus> [n_docs n_hosts frontier_every]
Mirrors bench_scaling's configuration exactly (GC threads, Arrow
batch, tmpfs shuffle, cached parquet inputs) and prints a per-stage
breakdown: wall span, summed task time, GC time, input/shuffle
volumes — plus the gaps between stages (driver time).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_scaling as B

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
# bench_scaling parses sys.argv at import (positions shifted by one
# here) — always override explicitly
B.N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 24_000_000
B.N_HOSTS = int(sys.argv[3]) if len(sys.argv) > 3 else 24_000
B.FRONTIER_EVERY = int(sys.argv[4]) if len(sys.argv) > 4 else 3
EVDIR = f"/tmp/spark-events-{CPUS}"


def main():
    from methanol_web_crawler_spark.config import default_config
    from methanol_web_crawler_spark.plans.crawl import SparkCrawler

    docs_path, frontier_path = B.materialize_inputs()

    os.makedirs(EVDIR, exist_ok=True)
    for f in glob.glob(EVDIR + "/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    # identical to bench_scaling.make_spark + event logging
    orig = B.make_spark
    B.make_spark = lambda cpus: orig(cpus, {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": EVDIR,
    })

    t = time.time()
    res = B.run_at(CPUS, docs_path, frontier_path)
    print(f"total run_at: {time.time()-t:.1f}s", flush=True)
    print(json.dumps(res), flush=True)
    analyze(None)


def analyze(clock_start_ms):
    evpath = sorted(glob.glob(EVDIR + "/*"))[-1]
    evfiles = (sorted(glob.glob(evpath + "/events_*"))
               if os.path.isdir(evpath) else [evpath])
    stages = {}
    for line in (ln for f in evfiles for ln in open(f)):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            st = stages.setdefault(sid, _empty())
            st.update(
                name=si["Stage Name"].split("\n")[0][:60],
                sub=si.get("Submission Time", 0),
                done=si.get("Completion Time", 0),
                tasks=si["Number of Tasks"],
            )
        elif e == "SparkListenerTaskEnd":
            st = stages.setdefault(ev["Stage ID"], _empty())
            m = ev.get("Task Metrics") or {}
            st["task_ms"] += m.get("Executor Run Time", 0)
            st["gc_ms"] += m.get("JVM GC Time", 0)
            st["cpu_ns"] += m.get("Executor CPU Time", 0)
            st["in_b"] += (m.get("Input Metrics") or {}).get(
                "Bytes Read", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            st["sh_r_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0)
            st["sh_w_b"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0)
            st["spill"] += m.get("Disk Bytes Spilled", 0)

    rows = [(sid, s) for sid, s in sorted(stages.items())
            if s["sub"] > 0]
    if clock_start_ms is None and rows:
        clock_start_ms = rows[0][1]["sub"]
    clocked = [(sid, s) for sid, s in rows
               if s["done"] >= clock_start_ms]
    print(f"\n{'sid':>4} {'tasks':>5} {'wall_s':>7} {'task_s':>8} "
          f"{'cpu_s':>8} {'gc_s':>6} {'in_GB':>6} {'shR_GB':>7} "
          f"{'shW_GB':>7} {'spill_GB':>8}  name")
    prev_done = clock_start_ms
    for sid, s in clocked:
        gap = (s["sub"] - prev_done) / 1000
        if gap > 0.3:
            print(f"     --- gap {gap:6.1f}s ---")
        w = (s["done"] - s["sub"]) / 1000
        print(f"{sid:>4} {s['tasks']:>5} {w:>7.1f} "
              f"{s['task_ms']/1000:>8.1f} {s['cpu_ns']/1e9:>8.1f} "
              f"{s['gc_ms']/1000:>6.1f} {s['in_b']/2**30:>6.2f} "
              f"{s['sh_r_b']/2**30:>7.2f} {s['sh_w_b']/2**30:>7.2f} "
              f"{s['spill']/2**30:>8.2f}  {s['name']}")
        prev_done = max(prev_done, s["done"])
    tw = sum(s["task_ms"] for _, s in clocked) / 1000
    tc = sum(s["cpu_ns"] for _, s in clocked) / 1e9
    tg = sum(s["gc_ms"] for _, s in clocked) / 1000
    print(f"\nstages: {len(clocked)}  sum task {tw:.0f}s  "
          f"sum cpu {tc:.0f}s  sum gc {tg:.0f}s")


def _empty():
    return {"name": "?", "tasks": 0, "sub": 0, "done": 0,
            "task_ms": 0, "gc_ms": 0, "cpu_ns": 0,
            "in_b": 0, "sh_r_b": 0, "sh_w_b": 0, "spill": 0}


if __name__ == "__main__":
    main()
