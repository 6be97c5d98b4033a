#!/bin/bash
# Round-5 hunter: alternates scalar / jvm official pairs, firing only
# in STRICT-band probe windows (bench_scaling.PROBE_STRICT_* — the
# single source of truth; today's firing-gate windows produced only
# degraded-window evidence). Stops when EACH mode has landed one pair
# whose own per-level probes sit inside the strict band
# (bench_scaling "strict_band"), or when attempts OR polls run out —
# MAX_POLLS bounds the wait-for-window loop so a sick host cannot
# spin the script forever. Every run self-labels in BENCH/BASELINE.md
# either way.
cd /root/repo || exit 1
ATTEMPT=0
POLL=0
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}
MAX_POLLS=${MAX_POLLS:-80}
SCALAR_OK=0
JVM_OK=0
while [ "$ATTEMPT" -lt "$MAX_ATTEMPTS" ] && [ "$POLL" -lt "$MAX_POLLS" ]; do
  if [ "$SCALAR_OK" -ge 1 ] && [ "$JVM_OK" -ge 1 ]; then
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
  echo "$(date -u +%H:%M:%S) probe copy1=$COPY1 copy4=$COPY4 ok=$OK scalar_ok=$SCALAR_OK jvm_ok=$JVM_OK attempt=$ATTEMPT poll=$POLL"
  if [ "$OK" != "1" ]; then
    sleep 90
    continue
  fi
  ATTEMPT=$((ATTEMPT+1))
  # alternate: odd attempts scalar, even jvm — unless one mode is done
  if [ $((ATTEMPT % 2)) -eq 1 ] && [ "$SCALAR_OK" -lt 1 ]; then
    MODE=scalar
  elif [ "$JVM_OK" -lt 1 ]; then
    MODE=jvm
  else
    MODE=scalar
  fi
  echo "$(date -u +%H:%M:%S) firing attempt $ATTEMPT mode=$MODE"
  METHANOL_RESOLVER=$MODE python bench_scaling.py \
    > "/tmp/hunt2_${ATTEMPT}_${MODE}.log" 2>&1
  RES=$(grep -o '"scaling_efficiency": [0-9.]*' "/tmp/hunt2_${ATTEMPT}_${MODE}.log" | tail -1)
  STRICT=$(grep -o '"strict_band": [a-z]*' "/tmp/hunt2_${ATTEMPT}_${MODE}.log" | tail -1)
  echo "$(date -u +%H:%M:%S) attempt $ATTEMPT mode=$MODE -> $RES $STRICT"
  if echo "$STRICT" | grep -q true; then
    if [ "$MODE" = scalar ]; then SCALAR_OK=$((SCALAR_OK+1)); else JVM_OK=$((JVM_OK+1)); fi
  fi
  sleep 30
done
echo "DONE scalar_ok=$SCALAR_OK jvm_ok=$JVM_OK attempts=$ATTEMPT polls=$POLL"
