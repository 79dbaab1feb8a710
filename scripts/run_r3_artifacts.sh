#!/usr/bin/env bash
# Round-3 artifact batch — chained so the TPU never idles between jobs.
# Each block appends to its benchmark_results CSV; all are resumable by
# re-running (suites skip nothing but rows accumulate; dedupe at analysis).
set -uo pipefail
cd "$(dirname "$0")/.."

SEEDS20="0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19"

echo "=== sampling 20-seed: burgers (nu=0.01 recipe) ==="
python scripts/run_sampling_suite.py --pde burgers --seeds "$SEEDS20" \
    --epochs 10000 --batch 512 --csv benchmark_results/sampling_r3.csv

echo "=== sampling 20-seed: burgers_sharp (nu=0.004) ==="
python scripts/run_sampling_suite.py --pde burgers --nu 0.004 --seeds "$SEEDS20" \
    --epochs 10000 --batch 512 --csv benchmark_results/sampling_r3.csv

echo "=== sampling 20-seed: kdv ==="
python scripts/run_sampling_suite.py --pde kdv --seeds "$SEEDS20" \
    --epochs 10000 --batch 512 --csv benchmark_results/sampling_r3.csv

echo "=== MFU off-operating-point profiles ==="
python scripts/profile_residual.py --batch 16384 --iters 30
mv benchmark_results/profile_burgers.json benchmark_results/profile_burgers_b16384.json
python scripts/profile_residual.py --batch 32768 --iters 30
mv benchmark_results/profile_burgers.json benchmark_results/profile_burgers_b32768.json
python scripts/profile_residual.py --batch 8192 --hidden 512 --iters 30
mv benchmark_results/profile_burgers.json benchmark_results/profile_burgers_h512.json
python scripts/profile_residual.py --batch 32768 --hidden 512 --iters 30
mv benchmark_results/profile_burgers.json benchmark_results/profile_burgers_b32768_h512.json
python scripts/profile_residual.py --batch 8192 --iters 30   # restore baseline file

echo "=== gridded operator, 3 seeds ==="
for s in 0 1 2; do
  python -m pinnrl_tpu.benchmarks.cli operator --gridded --epochs 1500 \
      --seed "$s" --csv benchmark_results/operator_gridded_r3.csv
done

echo "=== pendulum_nonlinear official 3 seeds (pinned basis) ==="
python scripts/run_convergence_suite.py --pdes pendulum_nonlinear \
    --seeds 0,1,2 --csv benchmark_results/convergence_r3.csv

echo "=== allen_cahn_dynamics official 3 seeds ==="
python scripts/run_convergence_suite.py --pdes allen_cahn_dynamics \
    --seeds 0,1,2 --csv benchmark_results/convergence_r3.csv

echo "ALL R3 ARTIFACTS DONE"
