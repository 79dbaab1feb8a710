#!/bin/bash
# Round-5 TPU queue #4: waits for the in-flight CH-dynamics official suite
# (pid in /tmp/ch_official.pid), then:
#   1. Black-Scholes kink fix probes (strike-focused IC sampling — the
#      error-field diagnosis localized the max-error outlier to the payoff
#      kink at (t=maturity, S=strike)).
#   2. DQN: finish sampling_r4.csv kdv to 20 paired seeds.
#   3. DQN non-stationary regime (windows=4), 20 seeds.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
while kill -0 "$(cat /tmp/ch_official.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done

echo "=== Black-Scholes: strike-focused IC probes ==="
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5 ic_width=2.0

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

echo "=== r5_queue4 done ==="
