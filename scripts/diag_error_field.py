"""Error-field diagnostic for a trained recipe checkpoint: where does the
rel-L2 live?

Reports |u_pred - u_exact| by time slab and by x-band, plus the f64 residual
RMS at a few times — the tool behind the KdV boundary-seeded-radiation
diagnosis (fixed-0 Dirichlet vs the soliton tail; see the 'exact' BC type).

Usage:
    python scripts/probe_recipe.py kdv bc=exact ... save=/tmp/kdv.msgpack
    python scripts/diag_error_field.py kdv /tmp/kdv.msgpack [bc=exact ...]

The variant keys after the checkpoint must match the probe's so the PDE the
model is diagnosed against is the one it trained on.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys

import jax
import jax.numpy as jnp

from pinnrl_tpu.benchmarks.convergence import build_recipe_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde


def main() -> None:
    pde_key, ckpt = sys.argv[1], sys.argv[2]
    cfg = build_recipe_config(pde_key)
    for a in sys.argv[3:]:
        k, v = a.split("=", 1)
        if k == "bc" and v == "exact":
            cfg.pde.boundary_conditions = {"dirichlet": {"type": "exact"}}
        elif k == "scale":
            cfg.model.arch_params["scale"] = v if ":" in v else float(v)
        elif k == "mapping_size":
            cfg.model.arch_params["mapping_size"] = int(v)
        elif k == "arch":
            cfg.model.architecture = v
            cfg.pde.architecture = v
        elif k == "hard_ic":
            cfg.model.hard_ic = v.lower() in ("1", "true")
        elif k == "hard_ic_T":
            cfg.pde.parameters["hard_ic_timescale"] = float(v)
        else:
            raise SystemExit(f"unknown key {k}")
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    model.load_state(ckpt)
    if cfg.model.hard_ic:
        # Saved params are the bare net; predictions need the composed
        # transform, exactly as in training (see PDETrainer wiring).
        model.output_transform = pde.hard_ic_transform()
    params = model.params

    (x_lo, x_hi) = pde.domain[0]
    t_lo, t_hi = pde.time_domain
    xs = jnp.linspace(x_lo, x_hi, 2001).reshape(-1, 1)

    print("== |err| by t ==")
    for t in jnp.linspace(t_lo, t_hi, 6):
        tt = jnp.full_like(xs, t)
        pred = model.apply(params, jnp.concatenate([xs, tt], axis=1)).reshape(-1)
        ex = pde.exact_solution(xs, tt).reshape(-1)
        err = jnp.abs(pred - ex)
        i = int(jnp.argmax(err))
        print(
            f"t={float(t):.2f}: rms={float(jnp.sqrt(jnp.mean(err**2))):.2e} "
            f"max={float(err[i]):.2e} at x={float(xs[i, 0]):.2f}"
        )

    print("== |err| by x band (t = mid) ==")
    t_mid = 0.5 * (t_lo + t_hi)
    tt = jnp.full_like(xs, t_mid)
    pred = model.apply(params, jnp.concatenate([xs, tt], axis=1)).reshape(-1)
    ex = pde.exact_solution(xs, tt).reshape(-1)
    err = jnp.abs(pred - ex)
    edges = jnp.linspace(x_lo, x_hi, 5)
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (xs[:, 0] >= lo) & (xs[:, 0] < hi)
        print(
            f"x in [{float(lo):.1f},{float(hi):.1f}): "
            f"rms={float(jnp.sqrt(jnp.mean(err[m] ** 2))):.2e} "
            f"max={float(jnp.max(err[m])):.2e}"
        )

    print("== residual rms (f32) ==")
    for t in jnp.linspace(t_lo + 0.1 * (t_hi - t_lo), t_hi - 0.1 * (t_hi - t_lo), 3):
        x_r = jnp.linspace(x_lo, x_hi, 1024).reshape(-1, 1)
        t_r = jnp.full_like(x_r, t)
        r = pde.compute_residual(model.apply, params, x_r, t_r).reshape(-1)
        print(
            f"t={float(t):.2f}: rms={float(jnp.sqrt(jnp.mean(r**2))):.2e} "
            f"max={float(jnp.max(jnp.abs(r))):.2e}"
        )


if __name__ == "__main__":
    main()
