#!/bin/bash
# KdV wave-2: exact-solution Dirichlet BC (the fixed-0 BC contradicts the
# soliton tail at x=+15 and the resulting dispersive error wave dominates
# rel-L2 — see /tmp/kdv_diag.log). Chain after the running batch, then run
# the round-2 artifact jobs. Each probe retried via probe_retry.sh because
# the axon backend intermittently fails to initialize after a worker crash.
set -u
WAIT_PID=${1:-}
PY=${PYTHONPATH:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
cd /root/repo
bash scripts/probe_retry.sh 2400 kdv bc=exact scale=1.0 epochs=1500
bash scripts/probe_retry.sh 3600 kdv bc=exact scale=1.0 epochs=3000
bash scripts/probe_retry.sh 3600 kdv bc=exact scale=1.0 epochs=3000 seed=1
bash scripts/probe_retry.sh 3600 kdv bc=exact scale=1.0 epochs=3000 seed=2
exec bash scripts/run_r2_artifacts.sh
