#!/usr/bin/env bash
# Wait for a healthy memory-bandwidth window, then capture the two
# timing artifacts the round needs: a bench suite run (BENCH_r3_self)
# and a fresh scaling run on the current code (SCALING_r3). The host's
# concurrent-DRAM capacity flickers minute-to-minute (ratio seen 0.01
# to 6.9 — see BASELINE.md "drifted host"); wall-times recorded in a
# starved window are machine noise, so everything here is gated on the
# same memory_bandwidth_control(8) probe bench.py uses and each
# artifact carries its own per-run/per-leg host_control for post-hoc
# validity checks. Run with NOTHING else on the machine.
set -u
cd "$(dirname "$0")/.."
MIN_RATIO="${MIN_RATIO:-5.0}"
WAIT_SEC="${WAIT_SEC:-14400}"
PROBE_EVERY="${PROBE_EVERY:-120}"

t0=$(date +%s)
while :; do
  ratio=$(python - <<'EOF'
from search_engine_spark.session import memory_bandwidth_control
print(memory_bandwidth_control(8)["concurrency_ratio"])
EOF
  )
  echo "$(date +%T) control ratio: $ratio (need >= $MIN_RATIO)"
  ok=$(python -c "print(1 if float('$ratio') >= float('$MIN_RATIO') else 0)")
  [ "$ok" = "1" ] && break
  if [ $(( $(date +%s) - t0 )) -ge "$WAIT_SEC" ]; then
    echo "window never opened within ${WAIT_SEC}s; giving up"
    exit 3
  fi
  sleep "$PROBE_EVERY"
done

echo "=== healthy window open: running bench ==="
BENCH_MIN_HEALTH="$MIN_RATIO" BENCH_HEALTH_TIMEOUT_SEC=60 \
  python bench.py 2>bench_healthy.log | tail -1 > BENCH_r3_healthy.json
tail -c 300 BENCH_r3_healthy.json; echo

echo "=== running scaling legs (taskset-pinned, current code) ==="
python jobs/scaling_bench.py --n-conv 100000 --base-cpus 2 --repeats 2 \
  2>scaling_r3.log | tail -1 > SCALING_r3.json
tail -c 300 SCALING_r3.json; echo
echo "DONE"
