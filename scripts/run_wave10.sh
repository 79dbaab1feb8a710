#!/bin/bash
# Wave-10: KdV seeds 1/2 are at 1.4-1.5e-3 vs the <1e-3 bar (seed 0: 7.4e-4).
# Levers this wave, most-promising first:
#   (a) feature_seed re-search at the GOOD scale — basis 0 won its
#       6-candidate search at the OLD scale 2.0 (recipe comment); the
#       scale-0.75 basis lottery has never been re-drawn. A basis that puts
#       all three trainable-init seeds under the bar is a legitimate recipe
#       fix (the basis is an architecture hyperparameter, pinned like
#       SIREN's omega_0).
#   (b) causal weighting at scale 0.75 (only probed at scale 1.0, ~equal) —
#       the error is a radiation wave growing with t, exactly what causal
#       gating targets.
#   (c) literature recipe: modified MLP + causal + lower lr + more steps
#       (Wang/Sankaran/Perdikaris causal-PINN KdV gets ~3e-4 — at far more
#       steps than our 7.5k; modified=1 was only probed at 500ep, scale 2.0).
#   (d) finish the wave-9 selection dataset (E=4 seed 2).
# Usage: run_wave10.sh [pid-to-wait-for]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo

# (a) basis sweep on the failing seeds
for fs in 1 2 3 4 5; do
  bash scripts/probe_retry.sh 2400 kdv scale=0.75 epochs=1500 seed=1 feature_seed=$fs
done
for fs in 1 2 3 4 5; do
  bash scripts/probe_retry.sh 2400 kdv scale=0.75 epochs=1500 seed=2 feature_seed=$fs
done
# (b) causal at the good scale
bash scripts/probe_retry.sh 2400 kdv scale=0.75 epochs=1500 seed=1 causal_eps=1.0
bash scripts/probe_retry.sh 2400 kdv scale=0.75 epochs=1500 seed=2 causal_eps=1.0
# (c) literature recipe probe (modified MLP + causal + long anneal)
bash scripts/probe_retry.sh 4800 kdv scale=0.75 epochs=4000 seed=1 modified=1 causal_eps=1.0 lr=1e-3
# (d) selection dataset completion
python scripts/tpu_wait_healthy.py 21600 && timeout 3600 python scripts/probe_kdv_selection.py 4 1500 2
echo "=== wave-10 done ==="
