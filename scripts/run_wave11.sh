#!/bin/bash
# Wave-11 (chained after wave-10): capacity/density at the good scale, plus
# lever stacking. Rationale: the "capacity is not the limit" ruling
# (map=256 -> 1.2e-3) predates the scale-0.75 recipe, and the residual is
# sampled at 40k points over a 30x5 domain — the radiation seed may simply
# be under-sampled between batch draws.
# Usage: run_wave11.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=1 mapping_size=256
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=1 hidden=512x512x512
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 seed=1 points=100000
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=1 feature_seed=1 causal_eps=1.0
bash scripts/probe_retry.sh 3600 kdv scale=0.75 epochs=1500 seed=2 feature_seed=1
echo "=== wave-11 done ==="
