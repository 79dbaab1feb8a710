#!/bin/bash
# Chain the round-2 artifact runs behind the KdV probe batch so the single
# TPU never idles. Usage: PYTHONPATH=/root/repo:/root/.axon_site nohup bash
# scripts/run_r2_artifacts.sh <pid-to-wait-for> > /tmp/r2_artifacts.log 2>&1 &
set -u
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
cd /root/repo

echo "=== inverse benchmark (heat + black_scholes) ==="
timeout 3600 python -m pinnrl_tpu.benchmarks.cli inverse --pde all \
  --csv benchmark_results/inverse.csv

echo "=== operator benchmark (synthetic Well FNO) ==="
timeout 3600 python -m pinnrl_tpu.benchmarks.cli operator \
  --dataset synthetic_heat_2d --epochs 2000 --points 8192 \
  --csv benchmark_results/operator.csv

echo "=== cahn-hilliard 2D attention convergence ==="
timeout 5400 python -m pinnrl_tpu.benchmarks.cli convergence \
  --pde cahn_hilliard --csv benchmark_results/convergence_ch.csv

echo "=== kdv sampling-strategy comparison (RL on the dispersion front) ==="
timeout 3600 python scripts/run_sampling_suite.py --pde kdv --seeds 0,1,2 \
  --epochs 10000 --batch 1024 --csv benchmark_results/sampling_kdv.csv

echo "=== done ==="
