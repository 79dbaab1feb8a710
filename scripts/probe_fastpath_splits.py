"""Decompose the train step: forward-only residual vs full step, generic vs
stacked vs stacked+remat.

The stacked-jet path moved the measured step 1.30-1.35x; this probe answers
what is left on the table — if the residual FORWARD is now a small share of
the step, a Pallas forward kernel cannot pay, and the remaining lever is the
backward's HBM traffic, which `jax.checkpoint` on the bundle (recompute the
streams inside the backward instead of storing S stream activations per
layer) attacks directly.

    python scripts/probe_fastpath_splits.py [--workload big]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde

WORKLOADS = {
    "ref": dict(pde="burgers", hidden=[64, 64, 64], mapping=32, batch=2048),
    "big": dict(pde="burgers", hidden=[256, 256, 256], mapping=128, batch=8192),
    "kdv": dict(pde="kdv", hidden=[256, 256, 256], mapping=256, batch=8192),
}


def build(name, mode):
    w = WORKLOADS[name]
    cfg = load_config(pde_type=w["pde"], architecture="fourier")
    cfg.model.hidden_dims = list(w["hidden"])
    cfg.model.arch_params["mapping_size"] = w["mapping"]
    cfg.training.num_boundary_points = 200
    cfg.training.num_initial_points = 100
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    if mode in ("stacked", "remat"):
        assert pde.attach_fast_bundle(model)
        if mode == "remat":
            pde._fast_bundle_fn = jax.checkpoint(
                pde._fast_bundle_fn,
                policy=jax.checkpoint_policies.nothing_saveable,
            )
    return pde, model, w["batch"]


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="ref,big,kdv")
    args = ap.parse_args()
    for name in args.workloads.split(","):
        for mode in ("generic", "stacked", "remat"):
            pde, model, batch = build(name, mode)
            key = jax.random.PRNGKey(0)
            x, t = pde.generate_collocation_points(key, batch)

            fwd = jax.jit(
                lambda p, x, t: jnp.sum(
                    pde.compute_residual(model.apply, p, x, t) ** 2
                )
            )
            opt = optax.adam(1e-3)
            opt_state = opt.init(model.params)

            @jax.jit
            def step(p, s, x, t):
                loss, g = jax.value_and_grad(
                    lambda pp: jnp.sum(
                        pde.compute_residual(model.apply, pp, x, t) ** 2
                    )
                )(p)
                up, s = opt.update(g, s)
                return optax.apply_updates(p, up), s, loss

            ms_fwd = timeit(fwd, model.params, x, t)
            ms_step = timeit(partial(step), model.params, opt_state, x, t)
            print(
                json.dumps(
                    dict(workload=name, mode=mode, fwd_ms=round(ms_fwd, 4),
                         res_step_ms=round(ms_step, 4))
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
