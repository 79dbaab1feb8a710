#!/bin/bash
# KdV wave-2: exact-solution Dirichlet BC (the fixed-0 BC contradicts the
# soliton tail at x=+15 and the resulting dispersive error wave dominates
# rel-L2 — see /tmp/kdv_diag.log). Chain after the running batch, then run
# the round-2 artifact jobs.
set -u
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
cd /root/repo
for v in "bc=exact scale=1.0 epochs=1500" \
         "bc=exact scale=1.0 epochs=3000" \
         "bc=exact scale=1.0 epochs=3000 seed=1" \
         "bc=exact scale=1.0 epochs=3000 seed=2"; do
  timeout 3600 python scripts/probe_recipe.py kdv $v || true
done
exec bash scripts/run_r2_artifacts.sh
