#!/bin/bash
# Round-2 artifact benchmarks, each gated on TPU health and retried once
# (the axon backend intermittently dies; see scripts/tpu_wait_healthy.py).
# Usage: PYTHONPATH=/root/repo:/root/.axon_site nohup bash
# scripts/run_r2_artifacts.sh <pid-to-wait-for> > /tmp/r2_artifacts.log 2>&1 &
set -u
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
cd /root/repo

run_gated() {
  local t=$1; shift
  for attempt in 1 2; do
    python scripts/tpu_wait_healthy.py 21600 || return 1
    if timeout "$t" "$@"; then return 0; fi
    echo "artifact attempt $attempt failed: $*" >&2
  done
  echo "artifact FAILED: $*" >&2
  return 1
}

echo "=== inverse benchmark (heat + black_scholes) ==="
run_gated 3600 python -m pinnrl_tpu.benchmarks.cli inverse --pde all \
  --csv benchmark_results/inverse.csv

echo "=== operator benchmark (synthetic Well FNO) ==="
run_gated 3600 python -m pinnrl_tpu.benchmarks.cli operator \
  --dataset synthetic_heat_2d --epochs 2000 --points 8192 \
  --csv benchmark_results/operator.csv

echo "=== cahn-hilliard 2D attention convergence ==="
run_gated 5400 python -m pinnrl_tpu.benchmarks.cli convergence \
  --pde cahn_hilliard --csv benchmark_results/convergence_ch.csv

echo "=== kdv sampling-strategy comparison (RL on the dispersion front) ==="
run_gated 3600 python scripts/run_sampling_suite.py --pde kdv --seeds 0,1,2 \
  --epochs 10000 --batch 1024 --csv benchmark_results/sampling_kdv.csv

echo "=== done ==="
