"""Sweep the RAD hyper-parameters (k, c, pool) for RAR on the Burgers harness.

VERDICT round-2 item 1a: the shipped sampling_r2.csv shows residual_based
LOSING to uniform (geomean 1.67e-3 vs 1.09e-3 over 6 seeds on the
point-starved Burgers harness). This sweep re-runs the identical harness
(batch 512, 10k epochs) over a grid of RAD settings to find a regime where
RAR >= uniform, or to establish there is none at this operating point.

    python scripts/run_rar_sweep.py --seeds 0,1,2,3,4,5 \
        --csv benchmark_results/rar_sweep.csv

One in-process loop: the jit cache makes config/seed repeats nearly free.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CONFIGS = [
    # (name, rar kwargs) — k = power, c = uniform_floor, pool = pool_factor
    ("rad_k1_c1_p4", dict(power=1.0, uniform_floor=1.0, pool_factor=4)),  # shipped default
    ("rad_k1_c0.5_p4", dict(power=1.0, uniform_floor=0.5, pool_factor=4)),
    ("rad_k1_c2_p4", dict(power=1.0, uniform_floor=2.0, pool_factor=4)),
    ("rad_k1_c4_p4", dict(power=1.0, uniform_floor=4.0, pool_factor=4)),
    ("rad_k2_c1_p4", dict(power=2.0, uniform_floor=1.0, pool_factor=4)),
    ("rad_k0.5_c1_p4", dict(power=0.5, uniform_floor=1.0, pool_factor=4)),
    ("rad_k1_c1_p2", dict(power=1.0, uniform_floor=1.0, pool_factor=2)),
    ("rad_k1_c1_p8", dict(power=1.0, uniform_floor=1.0, pool_factor=8)),
    # Without-replacement (Gumbel top-k) variants: with replacement, n draws
    # from a 4n pool waste ~11% of the batch on duplicates.
    ("rad_k1_c1_p4_nr", dict(power=1.0, uniform_floor=1.0, pool_factor=4, replace=False)),
    ("rad_k1_c2_p4_nr", dict(power=1.0, uniform_floor=2.0, pool_factor=4, replace=False)),
    ("rad_k1_c4_p4_nr", dict(power=1.0, uniform_floor=4.0, pool_factor=4, replace=False)),
    ("rad_k0.5_c1_p4_nr", dict(power=0.5, uniform_floor=1.0, pool_factor=4, replace=False)),
    ("rad_k2_c1_p8_nr", dict(power=2.0, uniform_floor=1.0, pool_factor=8, replace=False)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pde", default="burgers")
    ap.add_argument("--seeds", default="0,1,2,3,4,5")
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--csv", default=str(ROOT / "benchmark_results" / "rar_sweep.csv"))
    ap.add_argument("--configs", default="")
    ap.add_argument("--nu", type=float, default=None,
                    help="override Burgers viscosity (front width = 4 nu / a)")
    args = ap.parse_args()

    from pinnrl_tpu.benchmarks.sampling import _train_one

    if args.nu is not None:
        from pinnrl_tpu.benchmarks.convergence import RECIPES

        RECIPES["burgers"]["pde"]["parameters"]["nu"] = args.nu

    csv = Path(args.csv)
    if not csv.exists():
        csv.parent.mkdir(exist_ok=True)
        csv.write_text("pde,config,strategy,rel_l2,final_loss,wall_time_s,epochs,seed\n")

    configs = CONFIGS
    if args.configs:
        wanted = set(args.configs.split(","))
        configs = [c for c in CONFIGS if c[0] in wanted]

    seeds = [int(s) for s in args.seeds.split(",")]
    for seed in seeds:
        # Uniform baseline under the identical in-process harness.
        r = _train_one(args.pde, "uniform", args.epochs, args.batch, args.lr, seed)
        with open(csv, "a") as f:
            f.write(
                f"{args.pde},uniform,uniform,{r.rel_l2:.6e},"
                f"{r.final_loss:.6e},{r.wall_time_s:.3f},{r.epochs},{seed}\n"
            )
        print(f"uniform seed={seed}: rel_l2={r.rel_l2:.3e}", flush=True)
        for name, rar in configs:
            r = _train_one(
                args.pde, "residual_based", args.epochs, args.batch, args.lr,
                seed, rar=rar,
            )
            with open(csv, "a") as f:
                f.write(
                    f"{args.pde},{name},residual_based,{r.rel_l2:.6e},"
                    f"{r.final_loss:.6e},{r.wall_time_s:.3f},{r.epochs},{seed}\n"
                )
            print(f"{name} seed={seed}: rel_l2={r.rel_l2:.3e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
