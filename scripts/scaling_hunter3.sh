#!/bin/bash
# Round-5 evening hunter: fires, in priority order, whatever evidence
# is still missing whenever the host enters the STRICT healthy band
# (bench_scaling.PROBE_STRICT_* — single source of truth):
#   1. one scalar official 1-vs-4-executor pair in the strict band
#   2. one jvm official pair in the strict band
#   3. a bench.py rerun whose own before/after probes are healthy
#      (host_healthy=true) — re-establishes the ~47 s suite wall
# Every pair self-labels in BENCH/BASELINE.md (mechanical verdict);
# bench runs append to /tmp/bench_hunt_N.json and are transcribed by
# hand. MAX_POLLS bounds the wait so a sick host cannot spin forever.
# bench_scaling runs the bandwidth-sensitive 4N level FIRST, so a
# short window is enough for the measurement that matters.
cd /root/repo || exit 1
ATTEMPT=0
POLL=0
BENCH_N=0
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}
MAX_POLLS=${MAX_POLLS:-200}
SCALAR_OK=${SCALAR_OK:-0}
JVM_OK=${JVM_OK:-0}
BENCH_OK=${BENCH_OK:-0}
while [ "$POLL" -lt "$MAX_POLLS" ] && [ "$ATTEMPT" -lt "$MAX_ATTEMPTS" ]; do
  if [ "$SCALAR_OK" -ge 1 ] && [ "$JVM_OK" -ge 1 ] && [ "$BENCH_OK" -ge 1 ]; then
    break
  fi
  POLL=$((POLL+1))
  PROBE=$(python - <<'EOF'
import sys
sys.argv = ["probe"]
import bench_scaling as B
p = B.host_probe()
ok = int(p["probe_copy_s"] < B.PROBE_STRICT_COPY_MAX
         and p["probe_copy4_s"] < B.PROBE_STRICT_COPY4_MAX)
print(f"{p['probe_copy_s']} {p['probe_copy4_s']} {ok}")
EOF
)
  COPY1=$(echo "$PROBE" | awk '{print $1}')
  COPY4=$(echo "$PROBE" | awk '{print $2}')
  OK=$(echo "$PROBE" | awk '{print $3}')
  echo "$(date -u +%H:%M:%S) probe copy1=$COPY1 copy4=$COPY4 ok=$OK s=$SCALAR_OK j=$JVM_OK b=$BENCH_OK attempt=$ATTEMPT poll=$POLL"
  if [ "$OK" != "1" ]; then
    sleep 75
    continue
  fi
  if [ "$SCALAR_OK" -lt 1 ]; then
    MODE=scalar
  elif [ "$JVM_OK" -lt 1 ]; then
    MODE=jvm
  else
    MODE=bench
  fi
  ATTEMPT=$((ATTEMPT+1))
  echo "$(date -u +%H:%M:%S) firing attempt $ATTEMPT mode=$MODE"
  if [ "$MODE" = bench ]; then
    BENCH_N=$((BENCH_N+1))
    python bench.py > "/tmp/bench_hunt_${BENCH_N}.json" 2>/tmp/bench_hunt.err
    HEALTHY=$(grep -o '"host_healthy": [a-z]*' "/tmp/bench_hunt_${BENCH_N}.json" | tail -1)
    WALL=$(grep -o '"value": [0-9.]*' "/tmp/bench_hunt_${BENCH_N}.json" | head -1)
    echo "$(date -u +%H:%M:%S) attempt $ATTEMPT bench -> $WALL $HEALTHY"
    if echo "$HEALTHY" | grep -q true; then BENCH_OK=$((BENCH_OK+1)); fi
  else
    METHANOL_RESOLVER=$MODE python bench_scaling.py \
      > "/tmp/hunt3_${ATTEMPT}_${MODE}.log" 2>&1
    RES=$(grep -o '"scaling_efficiency": [0-9.]*' "/tmp/hunt3_${ATTEMPT}_${MODE}.log" | tail -1)
    STRICT=$(grep -o '"strict_band": [a-z]*' "/tmp/hunt3_${ATTEMPT}_${MODE}.log" | tail -1)
    echo "$(date -u +%H:%M:%S) attempt $ATTEMPT mode=$MODE -> $RES $STRICT"
    if echo "$STRICT" | grep -q true; then
      if [ "$MODE" = scalar ]; then SCALAR_OK=$((SCALAR_OK+1)); else JVM_OK=$((JVM_OK+1)); fi
    fi
  fi
  sleep 30
done
echo "DONE scalar_ok=$SCALAR_OK jvm_ok=$JVM_OK bench_ok=$BENCH_OK attempts=$ATTEMPT polls=$POLL"
