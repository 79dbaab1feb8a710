#!/bin/bash
# Round-5 TPU queue #1 (VERDICT r4 job #1): gridded-FNO bar — 3 fresh seeds
# at the round-4 config (10 training trajectories, corrected epoch
# accounting) PLUS a resolution-transfer row each (--transfer 96).
# Crash-riding: health-gate before every attempt, retry until the CSV grows.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
CSV=benchmark_results/operator_gridded_r5.csv
for s in 0 1 2; do
  BEFORE=$(wc -l < "$CSV" 2>/dev/null || echo 0)
  for attempt in 1 2 3 4; do
    python scripts/tpu_wait_healthy.py 10800 || { echo "TPU never recovered" >&2; exit 1; }
    timeout 1800 python -m pinnrl_tpu.benchmarks.cli operator --gridded \
        --epochs 1500 --seed "$s" --transfer 96 --csv "$CSV"
    AFTER=$(wc -l < "$CSV" 2>/dev/null || echo 0)
    if [ "$AFTER" -gt "$BEFORE" ]; then break; fi
    echo "FNO seed $s attempt $attempt produced no rows; retrying" >&2
    sleep 30
  done
done
echo "=== r5_queue1 done ==="
