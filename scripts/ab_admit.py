#!/usr/bin/env python
"""One-level mega-round A/B driver for the admission-stage modes.

Usage: python scripts/ab_admit.py <mode> [cpus]
  mode: scalar | jvm-py (METHANOL_JVM_ADMIT=0) | jvm
Prints one line: AB <mode> wall=<s> fetched=<n> seen=<n> tput=<u/s>
"""
import os
import sys

mode = sys.argv[1]
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

if mode == "scalar":
    os.environ["METHANOL_RESOLVER"] = "scalar"
elif mode == "jvm-py":
    os.environ["METHANOL_RESOLVER"] = "jvm"
    os.environ["METHANOL_JVM_ADMIT"] = "0"
elif mode == "jvm":
    os.environ["METHANOL_RESOLVER"] = "jvm"
    os.environ["METHANOL_JVM_ADMIT"] = "1"
else:
    raise SystemExit(f"unknown mode {mode}")

sys.argv = ["ab_admit"]
sys.path.insert(0, "/root/repo")
import bench_scaling as B  # noqa: E402

B.N_DOCS, B.N_HOSTS, B.FRONTIER_EVERY = 24_000_000, 24_000, 3
docs_path, frontier_path = B.materialize_inputs()
res = B.run_at(cpus, docs_path, frontier_path)
tput = (res["urls_fetched"] + res["urls_seen"]) / res["wall_sec"]
print(
    f"AB {mode} cpus={cpus} wall={res['wall_sec']} "
    f"fetched={res['urls_fetched']} seen={res['urls_seen']} "
    f"tput={tput:.0f} probe={res.get('probe_copy_s')}/"
    f"{res.get('probe_copy4_s')}",
    flush=True,
)
