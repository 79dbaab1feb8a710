#!/bin/bash
# Wave-15: single levers are seed-dependent lotteries at the 1e-3 bar
# (map256: s0 1.24e-3 / s1 6.2e-4; pts100k: s1 8.9e-4; causal: s2 8.2e-4 /
# s1 1.16e-3). Stack the three levers that attack DIFFERENT error sources
# (capacity, sampling density, temporal amplification) and measure all
# seeds; plus the cheap single-lever completions.
# Usage: run_wave15.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 seed=0 mapping_size=256 points=100000 causal_eps=1.0
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 seed=1 mapping_size=256 points=100000 causal_eps=1.0
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 seed=2 mapping_size=256 points=100000 causal_eps=1.0
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=0 points=100000
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=2 points=100000
echo "=== wave-15 done ==="
