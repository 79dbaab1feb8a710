#!/bin/bash
# Wave-14: CONFIRM the mapping-256 breakthrough (s1: 1.42e-3 -> 6.2e-4 at
# scale 0.75) across the other seeds, and measure whether causal stacks.
# Usage: run_wave14.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=0 mapping_size=256
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=2 mapping_size=256
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=1 mapping_size=256 causal_eps=1.0
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 seed=1 mapping_size=384
echo "=== wave-14 done ==="
