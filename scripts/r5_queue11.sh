#!/bin/bash
# Round-5 TPU queue #11 (endgame): DQN kdv completion to 20 paired seeds,
# then BS probes, then CH bites with any remaining time.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SEEDS_REST="11,12,13,14,15,16,17,18,19"
STRATS="residual_based,adaptive,adaptive[resfeat],adaptive[improve],adaptive[resfeat_improve]"
echo "=== DQN: kdv seeds 11-19 ==="
python scripts/tpu_wait_healthy.py 10800
python scripts/run_sampling_suite.py --pde kdv --seeds "$SEEDS_REST" \
    --epochs 10000 --batch 512 --strategies "$STRATS" \
    --csv benchmark_results/sampling_r4.csv

echo "=== BS strike-focused probes ==="
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5 ic_width=2.0

echo "=== CH bites: whatever time remains ==="
python scripts/ch_lbfgs_bites.py --seed 0 --resume-dir /tmp/ch_bank/s0 --start 4500
python scripts/ch_lbfgs_bites.py --seed 1 --resume-dir /tmp/ch_bank/s1

echo "=== r5_queue11 done ==="
