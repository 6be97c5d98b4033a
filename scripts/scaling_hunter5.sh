#!/bin/bash
# Round-5 session-5 hunter. Differences from scaling_hunter4.sh:
#   - priority order is flipped to close the last evidence gap first:
#     1. a CERTIFIED bench.py run (host_healthy AND sustained_clean
#        AND steal_clean — the ~100 s suite is cheap to retry, and a
#        healthy-window suite wall is the one VERDICT r4 ask #1 item
#        still open), then
#     2. scalar strict-band pairs (jvm already passed certified-quiet
#        0.825 at 01:06 UTC under sustained rule v2; scalar's best
#        certified run is 0.793 BELOW).
#   - pair satisfaction is judged by the v2-harmonized flags that
#     bench_scaling.py now emits (sustained_clean = during-copy MEAN
#     rule; the old hunter4 grep predates the harmonization commit and
#     kept hunting jvm after the pass landed).
#   - optionally waits for a PID (WAIT_PID) to exit before the first
#     poll, so a still-running orphaned measurement is not perturbed
#     by the gate's own copy/spin probes.
cd /root/repo || exit 1
if [ -n "$WAIT_PID" ]; then
  echo "$(date -u +%H:%M:%S) waiting for pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "$(date -u +%H:%M:%S) pid $WAIT_PID gone; hunting"
fi
ATTEMPT=0
POLL=0
BENCH_N=${BENCH_N:-20}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}
MAX_POLLS=${MAX_POLLS:-300}
SCALAR_TARGET=${SCALAR_TARGET:-1}
BENCH_TARGET=${BENCH_TARGET:-1}
SCALAR_OK=${SCALAR_OK:-0}
BENCH_OK=${BENCH_OK:-0}
rm -f /tmp/hunter_firing
trap 'rm -f /tmp/hunter_firing' EXIT
while [ "$POLL" -lt "$MAX_POLLS" ] && [ "$ATTEMPT" -lt "$MAX_ATTEMPTS" ]; do
  if [ "$SCALAR_OK" -ge "$SCALAR_TARGET" ] && [ "$BENCH_OK" -ge "$BENCH_TARGET" ]; then
    break
  fi
  POLL=$((POLL+1))
  PROBE=$(python - <<'EOF'
import multiprocessing as mp, sys, time
sys.argv = ["probe"]
import bench_scaling as B
p = B.host_probe()
def spin(dur):
    t_end = time.time() + dur
    x = 1
    while time.time() < t_end:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) % (2**31)
s0 = B.read_proc_stat()
ctx = mp.get_context("fork")
ps = [ctx.Process(target=spin, args=(2.0,)) for _ in range(8)]
[q.start() for q in ps]
[q.join() for q in ps]
st = B.steal_delta(s0, B.read_proc_stat())
ok = int(p["probe_copy_s"] < B.PROBE_STRICT_COPY_MAX
         and p["probe_copy4_s"] < B.PROBE_STRICT_COPY4_MAX
         and st["steal_pct_of_demand"] < 2.0)
print(f"{p['probe_copy_s']} {p['probe_copy4_s']} "
      f"{st['steal_pct_of_demand']} {ok}")
EOF
)
  COPY1=$(echo "$PROBE" | awk '{print $1}')
  COPY4=$(echo "$PROBE" | awk '{print $2}')
  STEAL=$(echo "$PROBE" | awk '{print $3}')
  OK=$(echo "$PROBE" | awk '{print $4}')
  echo "$(date -u +%H:%M:%S) probe copy1=$COPY1 copy4=$COPY4 steal%=$STEAL ok=$OK s=$SCALAR_OK b=$BENCH_OK attempt=$ATTEMPT poll=$POLL"
  if [ "$OK" != "1" ]; then
    sleep 70
    continue
  fi
  if [ "$BENCH_OK" -lt "$BENCH_TARGET" ]; then
    MODE=bench
  else
    MODE=scalar
  fi
  ATTEMPT=$((ATTEMPT+1))
  echo "$(date -u +%H:%M:%S) firing attempt $ATTEMPT mode=$MODE"
  touch /tmp/hunter_firing
  if [ "$MODE" = bench ]; then
    BENCH_N=$((BENCH_N+1))
    python bench.py > "/tmp/bench_hunt_${BENCH_N}.json" 2>/tmp/bench_hunt.err
    HEALTHY=$(grep -o '"host_healthy": [a-z]*' "/tmp/bench_hunt_${BENCH_N}.json" | tail -1)
    SUST=$(grep -o '"sustained_clean": [a-z]*' "/tmp/bench_hunt_${BENCH_N}.json" | tail -1)
    STEALC=$(grep -o '"steal_clean": [a-z]*' "/tmp/bench_hunt_${BENCH_N}.json" | tail -1)
    WALL=$(grep -o '"value": [0-9.]*' "/tmp/bench_hunt_${BENCH_N}.json" | head -1)
    echo "$(date -u +%H:%M:%S) attempt $ATTEMPT bench -> $WALL $HEALTHY $SUST $STEALC (/tmp/bench_hunt_${BENCH_N}.json)"
    if echo "$HEALTHY" | grep -q true && echo "$SUST" | grep -q true \
       && echo "$STEALC" | grep -q true; then
      BENCH_OK=$((BENCH_OK+1))
    fi
  else
    METHANOL_RESOLVER=$MODE python bench_scaling.py \
      > "/tmp/hunt5_${ATTEMPT}_${MODE}.log" 2>&1
    RES=$(grep -o '"scaling_efficiency": [0-9.]*' "/tmp/hunt5_${ATTEMPT}_${MODE}.log" | tail -1)
    STRICT=$(grep -o '"strict_band": [a-z]*' "/tmp/hunt5_${ATTEMPT}_${MODE}.log" | tail -1)
    STEALC=$(grep -o '"steal_clean": [a-z]*' "/tmp/hunt5_${ATTEMPT}_${MODE}.log" | tail -1)
    SUST=$(grep -o '"sustained_clean": [a-z]*' "/tmp/hunt5_${ATTEMPT}_${MODE}.log" | tail -1)
    echo "$(date -u +%H:%M:%S) attempt $ATTEMPT mode=$MODE -> $RES $STRICT $STEALC $SUST"
    if echo "$STRICT" | grep -q true && echo "$STEALC" | grep -q true \
       && echo "$SUST" | grep -q true; then
      SCALAR_OK=$((SCALAR_OK+1))
    fi
  fi
  rm -f /tmp/hunter_firing
  sleep 30
done
rm -f /tmp/hunter_firing
echo "DONE scalar_ok=$SCALAR_OK bench_ok=$BENCH_OK attempts=$ATTEMPT polls=$POLL"
