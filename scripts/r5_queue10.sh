#!/bin/bash
# Round-5 TPU queue #10: the corrected bites (train_seed varies per bite,
# model seed fixed), plus a free validation of the completed adam-polish
# orphan checkpoint; then BS probes and the DQN kdv completion.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

echo "=== validate the completed adam-polish s0 checkpoint (probe row) ==="
python scripts/tpu_wait_healthy.py 10800
timeout 900 python - <<'PY'
import json
from pathlib import Path
from flax import serialization
from pinnrl_tpu.benchmarks.convergence import build_recipe_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde

cfg = build_recipe_config("cahn_hilliard_dynamics")
pde = create_pde(cfg)
model = PINNModel(cfg, seed=0)
raw = Path("/tmp/conv_cahn_hilliard_dynamics_s0_g0bst_wm/checkpoint.msgpack").read_bytes()
restored = serialization.msgpack_restore(raw)
params = serialization.from_state_dict(model.params, restored["params"]["net"])
val = pde.validate(model.apply, params, num_points=20000)
row = (f"cahn_hilliard_dynamics|ep8000|s0|phase2=adam,"
      f"{val['rel_l2']:.6e},{val['max_error']:.6e},3.683069e-04,0.0")
with open("benchmark_results/probe_matrix.csv", "a") as f:
    f.write(row + "\n")
print(row)
PY

echo "=== CH seed 0 bites (lbfgs, bank 4000) ==="
python scripts/ch_lbfgs_bites.py --seed 0 --resume-dir /tmp/ch_bank/s0
echo "=== CH seed 1 bites (lbfgs, bank 4000) ==="
python scripts/ch_lbfgs_bites.py --seed 1 --resume-dir /tmp/ch_bank/s1
echo "=== CH seed 2 bites (fresh) ==="
python scripts/ch_lbfgs_bites.py --seed 2

echo "=== BS strike-focused probes ==="
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5 ic_width=2.0

SEEDS_REST="11,12,13,14,15,16,17,18,19"
STRATS="residual_based,adaptive,adaptive[resfeat],adaptive[improve],adaptive[resfeat_improve]"
echo "=== DQN: kdv seeds 11-19 ==="
python scripts/tpu_wait_healthy.py 10800
python scripts/run_sampling_suite.py --pde kdv --seeds "$SEEDS_REST" \
    --epochs 10000 --batch 512 --strategies "$STRATS" \
    --csv benchmark_results/sampling_r4.csv

echo "=== r5_queue10 done ==="
