"""Measure the stacked-jet fast path vs the per-point engine on TPU.

Times the fused train step (sample -> loss -> grad -> adam, lax.scan x50)
with training.stacked_jet on/off at three workloads:

- "ref":   the bench.py reference-parity workload (Burgers, 64x3, map 32,
           batch 2048, BC/IC 200/100)
- "big":   the profile workload (Burgers, 256^3, map 128, batch 8192)
- "kdv":   the KdV shipping-recipe shapes (256^3, map 256, batch 8192,
           order-3 jet)

Usage: python scripts/bench_stacked_jet.py [--csv out.csv]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax
import optax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde

WORKLOADS = {
    "ref": dict(pde="burgers", hidden=[64, 64, 64], mapping=32, batch=2048,
                nb=200, ni=100),
    "big": dict(pde="burgers", hidden=[256, 256, 256], mapping=128, batch=8192,
                nb=200, ni=100),
    "kdv": dict(pde="kdv", hidden=[256, 256, 256], mapping=256, batch=8192,
                nb=200, ni=100),
}

INNER = 50


def time_workload(name: str, fast: bool) -> dict:
    w = WORKLOADS[name]
    cfg = load_config(pde_type=w["pde"], architecture="fourier")
    cfg.model.hidden_dims = list(w["hidden"])
    cfg.model.arch_params["mapping_size"] = w["mapping"]
    cfg.training.num_boundary_points = w["nb"]
    cfg.training.num_initial_points = w["ni"]
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    if fast:
        assert pde.attach_fast_bundle(model), f"fast path unsupported for {name}"
    opt = optax.adam(2e-3)
    batch = w["batch"]

    def one_step(carry, _):
        params, opt_state, key = carry
        key, k_s, k_l = jax.random.split(key, 3)
        x, t = pde.generate_collocation_points(k_s, batch)
        loss, grads = jax.value_and_grad(
            lambda p: pde.compute_loss(model.apply, p, x, t, key=k_l)["total"]
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    @jax.jit
    def epoch(carry):
        return jax.lax.scan(one_step, carry, None, length=INNER)

    carry = (model.params, opt.init(model.params), jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    compile_s = time.perf_counter() - t0

    n_epochs = 10
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0
    pts_per_sec = n_epochs * INNER * batch / wall
    return dict(
        workload=name, stacked_jet=fast, pts_per_sec=round(pts_per_sec, 1),
        step_ms=round(1e3 * wall / (n_epochs * INNER), 4),
        compile_s=round(compile_s, 1),
        final_loss=float(losses[-1]),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="ref,big,kdv")
    args = ap.parse_args()
    results = []
    for name in args.workloads.split(","):
        for fast in (False, True):
            r = time_workload(name, fast)
            results.append(r)
            print(json.dumps(r), flush=True)
    for name in args.workloads.split(","):
        rs = [r for r in results if r["workload"] == name]
        if len(rs) == 2:
            print(
                f"# {name}: speedup x{rs[1]['pts_per_sec'] / rs[0]['pts_per_sec']:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
