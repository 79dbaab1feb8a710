#!/bin/bash
# Round-5 TPU queue #3 v2 (after queue2; reprioritized after the mu_h2
# probe landed 3.4e-3 at ep1500 — 6.7x over baseline at equal budget):
#   1. CH-dynamics weight/schedule probes around the new mu_h2 lever.
#   2. Black-Scholes max-error diagnosis (VERDICT r4 job #6).
#   3. CH-dynamics OFFICIAL 3 seeds, ep8000, composed recipe
#      (mass=100 + causal + mu_h2=0.1) -> convergence_r3.csv.
#   4. DQN: finish sampling_r4.csv kdv to 20 paired seeds.
#   5. DQN non-stationary regime (windows=4) at 20 seeds.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
while kill -0 "$(cat /tmp/r5_queue2.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done

echo "=== CH probes: schedule scaling + weight sensitivity ==="
bash scripts/probe_retry.sh 3000 cahn_hilliard_dynamics epochs=4000 seed=0 w_mu_h2=0.1
bash scripts/probe_retry.sh 2400 cahn_hilliard_dynamics epochs=1500 seed=0 w_mu_h2=0.03

echo "=== Black-Scholes: train + save checkpoint ==="
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 save=/tmp/bs_r5.msgpack
echo "=== Black-Scholes: error-field diagnosis ==="
python scripts/tpu_wait_healthy.py 10800
timeout 900 python scripts/diag_error_field.py black_scholes /tmp/bs_r5.msgpack

echo "=== CH dynamics OFFICIAL: 3 seeds ep8000 (mass+causal+mu_h2) ==="
python scripts/tpu_wait_healthy.py 10800
python scripts/run_convergence_suite.py --pdes cahn_hilliard_dynamics \
    --seeds 0,1,2 --csv benchmark_results/convergence_r3.csv --timeout 10800

SEEDS_REST="11,12,13,14,15,16,17,18,19"
STRATS="residual_based,adaptive,adaptive[resfeat],adaptive[improve],adaptive[resfeat_improve]"
echo "=== DQN: kdv seeds 11-19 (complete the r4 study to 20) ==="
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

echo "=== r5_queue3 done ==="
