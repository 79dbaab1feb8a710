#!/bin/bash
# Wave-8 (chained after wave-7):
#   1. KdV restart-selection probe — 8-member vmapped ensemble at the
#      shipping recipe, physics-only (dense total loss) member selection,
#      seeds 1 and 2. If selection tracks the oracle, best-of-E restarts
#      becomes the shipping recipe and should put all seeds < 1e-3.
#   2. Heat seed-0 probes — convergence.csv has seed0 at 1.47e-3 (seeds 1/2
#      are under the bar); sweep the Fourier scale like wave/heat_2d did
#      (both wanted a lower-frequency basis than the 2.0 default).
# Usage: run_wave8.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
python scripts/tpu_wait_healthy.py 21600 || exit 1
timeout 3600 python scripts/probe_kdv_selection.py 8 1500 1
timeout 3600 python scripts/probe_kdv_selection.py 8 1500 2
bash scripts/probe_retry.sh 3600 heat scale=1.0 epochs=3000 seed=0
bash scripts/probe_retry.sh 3600 heat scale=0.75 epochs=3000 seed=0
echo "=== wave-8 done ==="
