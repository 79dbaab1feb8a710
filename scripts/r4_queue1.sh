#!/bin/bash
# Round-4 TPU queue #1: artifact consolidation (VERDICT round-3 next-step 2).
# Waits for the in-flight CH probe, then reruns AC-dynamics seeds 0/1 and
# biharmonic x3 as OFFICIAL convergence_r3.csv rows via the crash-riding
# suite runner.
cd /root/repo
while kill -0 "$(cat /tmp/ch_probe.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "=== AC dynamics seeds 0,1 ==="
python scripts/run_convergence_suite.py --pdes allen_cahn_dynamics --seeds 0,1 \
    --csv benchmark_results/convergence_r3.csv
echo "=== biharmonic seeds 0,1,2 ==="
python scripts/run_convergence_suite.py --pdes cahn_hilliard_biharmonic --seeds 0,1,2 \
    --csv benchmark_results/convergence_r3.csv --timeout 10800
echo "=== queue1 done ==="
