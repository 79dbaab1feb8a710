#!/bin/bash
# KdV wave-4: close the <1e-3 north star from the wave-3 lead.
# Wave-3 data (probe_matrix.csv, seed 0): scale=1.0@ep1500 hit 1.66e-3 —
# 2.2x better than the shipping scale=2.0 recipe (3.7e-3) and through the
# "dispersive floor" the recipe comment hypothesized. bc=exact did NOT help
# at scale=1.0 (2.10e-3), so the plain fixed-0 BC stays. This wave answers:
# (a) does longer training keep paying at scale=1.0 (the scale=2.0 overfit
# at ep3000 may have been basis mismatch, not jet noise)? (b) seed
# robustness; (c) capacity (mapping 256) and a finer scale grid; (d) does an
# L-BFGS polish stack on top? Then it chains into the round-2 artifact jobs.
set -u
cd /root/repo
bash scripts/probe_retry.sh 3600 kdv scale=1.0 epochs=3000
bash scripts/probe_retry.sh 2400 kdv scale=1.0 epochs=1500 seed=1
bash scripts/probe_retry.sh 2400 kdv scale=1.0 epochs=1500 seed=2
bash scripts/probe_retry.sh 2400 kdv scale=0.75 epochs=1500
bash scripts/probe_retry.sh 2400 kdv scale=1.25 epochs=1500
bash scripts/probe_retry.sh 2400 kdv scale=1.0 epochs=1500 mapping_size=256
bash scripts/probe_retry.sh 3600 kdv scale=1.0 epochs=3000 optimizer=adam_lbfgs
echo "=== wave-4 probes done; starting round-2 artifact chain ==="
exec bash scripts/run_r2_artifacts.sh
