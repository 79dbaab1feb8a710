#!/bin/bash
# Wave-9:
#   1. Confirm heat seeds 1/2 at the wave-8 winner (Fourier scale 0.75:
#      seed0 1.47e-3 -> 2.49e-4; scale 1.0 gave 2.83e-4).
#   2. KdV restart-selection with retries and a smaller ensemble (the E=8
#      ep1500 runs both died on the flaky axon TPU-worker crash).
# Usage: run_wave9.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
bash scripts/probe_retry.sh 3600 heat scale=0.75 epochs=3000 seed=1
bash scripts/probe_retry.sh 3600 heat scale=0.75 epochs=3000 seed=2

sel() {  # sel <E> <epochs> <seed> — retry the selection probe on TPU crashes
  local E=$1 EP=$2 S=$3
  local BEFORE AFTER
  BEFORE=$(wc -l < benchmark_results/probe_kdv_selection.csv 2>/dev/null || echo 0)
  for attempt in 1 2 3; do
    python scripts/tpu_wait_healthy.py 21600 || return 1
    timeout 3600 python scripts/probe_kdv_selection.py "$E" "$EP" "$S"
    AFTER=$(wc -l < benchmark_results/probe_kdv_selection.csv 2>/dev/null || echo 0)
    if [ "$AFTER" -gt "$BEFORE" ]; then return 0; fi
    echo "selection attempt $attempt failed (E=$E seed=$S); retrying" >&2
    sleep 30
  done
  return 1
}

sel 4 1500 1
sel 4 1500 2
echo "=== wave-9 done ==="
