#!/bin/bash
# Round-5 TPU queue #8: CH officials via short lbfgs bites (each bite
# resumes the banked checkpoint, advances 500 epochs, exits cleanly), then
# BS probes, then the DQN program. Single writer on the device.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

echo "=== CH officials via bites: seed 0 (banked adam phase) ==="
python scripts/ch_lbfgs_bites.py --seed 0 --resume-dir /tmp/ch_bank/s0
echo "=== seed 1 (banked adam phase) ==="
python scripts/ch_lbfgs_bites.py --seed 1 --resume-dir /tmp/ch_bank/s1
echo "=== seed 2 (fresh) ==="
python scripts/ch_lbfgs_bites.py --seed 2

echo "=== BS strike-focused probes (fixed) ==="
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5 ic_width=2.0

SEEDS_REST="11,12,13,14,15,16,17,18,19"
STRATS="residual_based,adaptive,adaptive[resfeat],adaptive[improve],adaptive[resfeat_improve]"
echo "=== DQN: kdv seeds 11-19 ==="
python scripts/tpu_wait_healthy.py 10800
python scripts/run_sampling_suite.py --pde kdv --seeds "$SEEDS_REST" \
    --epochs 10000 --batch 512 --strategies "$STRATS" \
    --csv benchmark_results/sampling_r4.csv

SEEDS20="0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19"
echo "=== DQN: non-stationary regime (kdv, windows=4, 20 seeds) ==="
python scripts/tpu_wait_healthy.py 10800
python scripts/run_sampling_suite.py --pde kdv --seeds "$SEEDS20" \
    --epochs 10000 --batch 512 --windows 4 \
    --strategies "uniform,residual_based,adaptive,adaptive[resfeat]" \
    --csv benchmark_results/sampling_r5.csv

echo "=== r5_queue8 done ==="
