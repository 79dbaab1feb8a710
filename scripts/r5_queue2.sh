#!/bin/bash
# Round-5 TPU queue #2 (after queue1 = gridded FNO):
#   1. on-TPU Pallas parity tier (now incl. causal fused kernel + order-3 +
#      DFT spectral conv)
#   2. fused-kernel A/B on KdV (order-3 + causal, VERDICT r4 job #3) with a
#      VMEM tile sweep
#   3. CH-dynamics round-5 levers: mu_h2 quick probes + the tm4 composed
#      probe the round-4 README cited ahead of the data (VERDICT r4 job #2)
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
while kill -0 "$(cat /tmp/r5_queue1.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done

echo "=== on-TPU Pallas parity tier ==="
python scripts/tpu_wait_healthy.py 10800
PINNRL_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_pallas_parity_tpu.py -q 2>&1 | tail -5

echo "=== fused kernel A/B: kdv (causal, order 3) tile sweep ==="
for tile_arg in "" "--tile 32" "--tile 64" "--tile 128"; do
  python scripts/tpu_wait_healthy.py 10800
  timeout 1500 python scripts/bench_fused_kernel.py kdv --arm fused $tile_arg 2>&1 | tail -2
done
python scripts/tpu_wait_healthy.py 10800
timeout 1500 python scripts/bench_fused_kernel.py kdv --arm xla 2>&1 | tail -2
echo "=== fused kernel A/B: kdv causal OFF (pure order-3 effect) ==="
timeout 1500 python scripts/bench_fused_kernel.py kdv --causal 0 2>&1 | tail -2

echo "=== CH dynamics: mu_h2 quick probes (ep1500 baseline was 2.3e-2) ==="
bash scripts/probe_retry.sh 2400 cahn_hilliard_dynamics epochs=1500 seed=0 w_mu_h2=0.1
bash scripts/probe_retry.sh 2400 cahn_hilliard_dynamics epochs=1500 seed=0 w_mu_h2=1.0

echo "=== CH dynamics: tm4 composed probe (ep8000 total, 4 windows) ==="
bash scripts/probe_retry.sh 7200 cahn_hilliard_dynamics epochs=8000 seed=0 tm=4

echo "=== r5_queue2 done ==="
