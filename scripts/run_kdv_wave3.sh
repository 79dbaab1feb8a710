#!/bin/bash
# KdV wave-3: decision matrix for the <1e-3 north star.
# Leads: probe_matrix shows scale=1.0@ep1500 hit 1.66e-3 (vs shipping
# scale=2.0 3.7e-3), and the 'exact' Dirichlet BC removes the fixed-0
# contradiction with the soliton tail (~9e-5 at x=+15 by t=5) that seeds
# the dispersive error wave. Matrix: {bc=exact?} x {scale 0.75/1.0} x
# {seeds 0,1,2} at ep1500, then inspect before committing to 3000-epoch
# confirmation runs. Chains into the round-2 artifact jobs afterwards.
set -u
cd /root/repo
bash scripts/probe_retry.sh 2400 kdv bc=exact scale=1.0 epochs=1500
bash scripts/probe_retry.sh 2400 kdv bc=exact scale=0.75 epochs=1500
bash scripts/probe_retry.sh 2400 kdv scale=1.0 epochs=1500 seed=1
bash scripts/probe_retry.sh 2400 kdv scale=1.0 epochs=1500 seed=2
bash scripts/probe_retry.sh 2400 kdv bc=exact scale=1.0 epochs=1500 seed=1
bash scripts/probe_retry.sh 2400 kdv bc=exact scale=1.0 epochs=1500 seed=2
echo "=== wave-3 probes done; starting artifact chain ==="
exec bash scripts/run_r2_artifacts.sh
