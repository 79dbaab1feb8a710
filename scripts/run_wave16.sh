#!/bin/bash
# Wave-16: OFFICIAL convergence-suite runs at the final shipping recipes —
# kdv (wave-15 stacked recipe) and heat (scale 0.75) x 3 seeds — appended
# to convergence_r2.csv for the judged-artifact refresh.
# Usage: run_wave16.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
python scripts/tpu_wait_healthy.py 21600 || exit 1
python scripts/run_convergence_suite.py --pdes kdv,heat --seeds 0,1,2 --timeout 5400
echo "=== wave-16 done ==="
