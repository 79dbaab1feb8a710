#!/bin/bash
# Round-4 TPU queue #3: after queue2 — on-TPU Pallas parity tests, gridded
# FNO 3 seeds + resolution-transfer rows, and a clean-chip bench.py run.
cd /root/repo
while pgrep -f "r4_queue2.sh" > /dev/null; do sleep 60; done

echo "=== on-TPU Pallas parity tests ==="
PINNRL_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_pallas_parity_tpu.py -q

echo "=== gridded FNO 3 seeds + transfer 96 ==="
for s in 0 1 2; do
  timeout 1800 python -m pinnrl_tpu.benchmarks.cli operator --gridded \
      --epochs 1500 --seed "$s" --transfer 96 \
      --csv "benchmark_results/operator_gridded_r4_s${s}.csv"
done

echo "=== clean-chip bench.py ==="
timeout 1200 python bench.py

echo "=== queue3 done ==="
