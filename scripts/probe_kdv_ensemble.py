"""KdV ensemble probe: does the deep-ensemble mean predictor break the
~4-6e-3 dispersive-radiation floor (VERDICT round-2 north star: < 1e-3)?

Variants (all on the shipping annealed-adam recipe):
  single   : E=1 baseline at the probe epoch budget
  ens-pin  : E=8, shared pinned basis (feature_seed=0) — init diversity only
  ens-div  : E=8, per-member TRAINABLE basis (feature_seed=None) — basis
             diversity + gradient-adapted frequency coverage
  ens-trn  : E=8, trainable basis from the SAME init (feature_seed=0)

Usage: python scripts/probe_kdv_ensemble.py [epochs] [variants...]
Appends rows to benchmark_results/probe_kdv_ensemble.csv
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys
import time
from pathlib import Path

import numpy as np

from pinnrl_tpu.benchmarks.convergence import build_recipe_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training.trainer import PDETrainer

VARIANTS = {
    "single": dict(ensemble=1, feature_seed=0, trainable=False),
    "ens-pin": dict(ensemble=8, feature_seed=0, trainable=False),
    "ens-div": dict(ensemble=8, feature_seed=None, trainable=True),
    "ens-trn": dict(ensemble=8, feature_seed=0, trainable=True),
}

OUT = Path("benchmark_results/probe_kdv_ensemble.csv")


def run(variant: str, epochs: int, seed: int = 0) -> dict:
    v = VARIANTS[variant]
    cfg = build_recipe_config("kdv", epochs=epochs)
    cfg.model.arch_params["feature_seed"] = v["feature_seed"]
    cfg.model.arch_params["trainable_features"] = v["trainable"]
    cfg.training.ensemble_size = v["ensemble"]
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    res = trainer.train(seed=seed)
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]
    val = pde.validate(model.apply, params, num_points=20000)
    row = dict(
        variant=variant, epochs=epochs, seed=seed,
        rel_l2=float(val["rel_l2"]), max_error=float(val["max_error"]),
        final_train_loss=float(res["final_train_loss"]), wall_s=wall,
    )
    # Per-member rel-L2 (ensemble only): how much does averaging buy?
    if v["ensemble"] > 1:
        import jax

        members = []
        for m in range(v["ensemble"]):
            p = jax.tree_util.tree_map(lambda a: a[m], params)
            members.append(float(pde.validate(model.apply, p, num_points=20000)["rel_l2"]))
        row["member_rel_l2"] = "|".join(f"{x:.3e}" for x in members)
        row["member_median"] = float(np.median(members))
    else:
        row["member_rel_l2"] = ""
        row["member_median"] = row["rel_l2"]
    return row


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    names = sys.argv[2:] or list(VARIANTS)
    OUT.parent.mkdir(exist_ok=True)
    new = not OUT.exists()
    with OUT.open("a") as f:
        if new:
            f.write("variant,epochs,seed,rel_l2,max_error,final_train_loss,wall_s,member_median,member_rel_l2\n")
        for name in names:
            row = run(name, epochs)
            f.write(
                f'{row["variant"]},{row["epochs"]},{row["seed"]},{row["rel_l2"]:.6e},'
                f'{row["max_error"]:.6e},{row["final_train_loss"]:.6e},{row["wall_s"]:.1f},'
                f'{row["member_median"]:.6e},{row["member_rel_l2"]}\n'
            )
            f.flush()
            print(row, flush=True)


if __name__ == "__main__":
    main()
