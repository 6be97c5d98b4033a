#!/usr/bin/env python
"""Bloom seen-filter at out-of-core scale (VERDICT r4 ask #6).

The round-3 diagnostic showed the bloom removes 69.9% of exact
anti-join probes but LOSES wall time at in-memory scale (202 vs
151-182 s): the bitmap build + cogrouped probe touch all candidates
while the avoided exact join is cheap when the seen side fits in
memory. The deployment advice ("--bloom past memory scale") was
recorded but never measured where it claims to pay. This script
measures it: the SAME 8-core mega-round level with the executor heap
shrunk so the seen side of the anti-join no longer fits
(SPARK_GRAFT_EXECUTOR_MEM_MB, default 2048 vs the recipe's 12288),
bloom OFF then bloom ON, adjacent in one window, probes recorded,
checksums asserted identical.

Usage: python scripts/bloom_ooc.py [mem_mb] [cores]
Appends a self-labeling section to BENCH/BASELINE.md.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)  # BENCH/BASELINE.md append is repo-relative

MEM_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8

os.environ["SPARK_GRAFT_EXECUTOR_MEM_MB"] = str(MEM_MB)
_argv, sys.argv = sys.argv, [sys.argv[0]]  # argv-at-import trap
import bench_scaling as B  # noqa: E402

sys.argv = _argv


def main():
    docs_path, frontier_path = B.materialize_inputs()
    out = {}
    for bloom in (False, True):
        B.BLOOM = bloom
        r = B.run_at(CORES, docs_path, frontier_path)
        out["bloom_on" if bloom else "bloom_off"] = r
        print(json.dumps({"bloom": bloom, **r}), flush=True)
    off, on = out["bloom_off"], out["bloom_on"]
    assert (off["urls_fetched"], off["urls_seen"]) == (
        on["urls_fetched"], on["urls_seen"]
    ), "bloom changed crawl results"
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    ratio = round(off["wall_sec"] / on["wall_sec"], 3)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Bloom at reduced-heap scale ({B.N_DOCS} docs, "
            f"{CORES} cores, executor mem {MEM_MB} MB) [{stamp}]\n\n"
            "Same 8-core mega-round level, executor heap shrunk from "
            "the recipe's 12288 MB so the seen anti-join runs "
            "memory-tight; bloom OFF vs ON adjacent in one window "
            "(identical fetched/seen checksums asserted).\n\n"
            "| bloom | wall s | URLs/s | probes cpu/copy/copy4 |\n"
            "|---|---|---|---|\n"
            + "".join(
                f"| {'on' if b else 'off'} | {r['wall_sec']} "
                f"| {r['urls_per_sec']} | {r['probe_cpu_s']}/"
                f"{r['probe_copy_s']}/{r['probe_copy4_s']} |\n"
                for b, r in ((False, off), (True, on))
            )
            + f"\nwall(off)/wall(on) = **{ratio}** — bloom "
            + ("PAYS" if ratio > 1.0 else "does not pay")
            + " at this heap size.\n"
        )


if __name__ == "__main__":
    main()
