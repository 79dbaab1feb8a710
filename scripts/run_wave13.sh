#!/bin/bash
# Wave-13 (chained after wave-12): first TPU probes of the four new
# convergence recipes (convection / allen_cahn / black_scholes / pendulum,
# all with genuinely-exact targets measured in f64) at seed 0, plus a scale
# alternative each where the right basis frequency is uncertain.
# Usage: run_wave13.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
bash scripts/probe_retry.sh 3600 convection epochs=1500 seed=0
bash scripts/probe_retry.sh 3600 allen_cahn epochs=1500 seed=0
bash scripts/probe_retry.sh 3600 black_scholes epochs=1500 seed=0
bash scripts/probe_retry.sh 3600 pendulum epochs=1500 seed=0
bash scripts/probe_retry.sh 3600 convection epochs=1500 seed=0 scale=0.5
bash scripts/probe_retry.sh 3600 allen_cahn epochs=1500 seed=0 scale=1.0
bash scripts/probe_retry.sh 3600 pendulum epochs=1500 seed=0 scale=3.0
bash scripts/probe_retry.sh 3600 black_scholes epochs=1500 seed=0 scale=0.5
echo "=== wave-13 done ==="
