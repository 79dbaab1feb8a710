#!/bin/bash
# KdV wave-6: push seeds 1/2 under the 1e-3 bar, then run the r2 artifacts.
# Wave-5 data: scale=0.75@ep1500 = 7.4e-4/1.42e-3/1.54e-3 (s0/s1/s2);
# +stage2(1000,scale 1.5x->1.125): s0 7.4e-4 -> 6.9e-4 (8% — the correction
# stage inherits the dispersive amplification, it doesn't break it);
# map=256@0.75 1.24e-3; scale=0.6 1.88e-3; adam_lbfgs@1.0 2.08e-3.
# This wave: (a) does stage2 rescue s1/s2? (b) same-scale longer stage2;
# (c) 4-member deep ensemble at the good scale (decorrelated init lottery).
# Usage: run_kdv_wave6.sh [pid-to-wait-for]
set -u
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 stage2=1000 stage2_scale=1.5 seed=1
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 stage2=1000 stage2_scale=1.5 seed=2
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 stage2=1500 stage2_scale=0.75
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=1500 ensemble=4
echo "=== wave-6 probes done; starting round-2 artifact chain ==="
exec bash scripts/run_r2_artifacts.sh
