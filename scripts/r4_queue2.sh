#!/bin/bash
# Round-4 TPU queue #2: runs after queue1 (AC consolidation + biharmonic x3).
# 1. Cahn-Hilliard dynamics, new shipping recipe (mass+causal, 8k epochs),
#    3 seeds -> official convergence_r3.csv rows (VERDICT r4 job #1).
# 2. DQN regime probes: 20-seed paired adaptive-variant studies on the two
#    regimes where adaptivity pays (VERDICT r4 job #4).
cd /root/repo
while pgrep -f "r4_queue1.sh" > /dev/null; do sleep 60; done

echo "=== CH dynamics (mass+causal recipe) seeds 0,1,2 ==="
python scripts/run_convergence_suite.py --pdes cahn_hilliard_dynamics \
    --seeds 0,1,2 --csv benchmark_results/convergence_r3.csv --timeout 10800

SEEDS20="0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19"
STRATS="residual_based,adaptive,adaptive[resfeat],adaptive[improve],adaptive[resfeat_improve]"

echo "=== DQN regime probes: kdv 20 seeds ==="
python scripts/run_sampling_suite.py --pde kdv --seeds "$SEEDS20" \
    --epochs 10000 --batch 512 --strategies "$STRATS" \
    --csv benchmark_results/sampling_r4.csv

echo "=== DQN regime probes: burgers_sharp 20 seeds ==="
python scripts/run_sampling_suite.py --pde burgers --nu 0.004 --seeds "$SEEDS20" \
    --epochs 10000 --batch 512 --strategies "$STRATS" \
    --csv benchmark_results/sampling_r4.csv

echo "=== queue2 done ==="
