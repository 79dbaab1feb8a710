"""Profile the fused PINN train step on the TPU: wall time, XLA FLOP count,
and model-FLOPs-utilization (MFU) vs the v5e peak.

VERDICT round-1 item 10 asked for a measurement before building deeper
Pallas kernels: this script times the exact hot path the bench runs (heat /
Burgers Fourier-MLP residual + BC/IC + grad + adam) and derives MFU from
XLA's own cost analysis, then optionally captures a jax.profiler trace.

Run on the TPU host:
    python scripts/profile_residual.py [--pde burgers] [--trace]
Writes benchmark_results/profile_<pde>.json (and profile_trace/ with --trace).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde

# v5e peak: ~197 TFLOP/s bf16, ~0.5x for f32-via-MXU passes (highest
# precision does 3-6 bf16 passes per f32 matmul; we report both bases).
PEAK_BF16 = 197e12
PEAK_F32_EST = PEAK_BF16 / 4


def build_step(pde_key: str, batch: int, hidden: int, mapping: int):
    cfg = load_config(pde_type=pde_key, architecture="fourier")
    cfg.model.hidden_dims = [hidden] * 3
    cfg.model.arch_params["mapping_size"] = mapping
    cfg.training.num_boundary_points = 4096
    cfg.training.num_initial_points = 4096
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)  # stacked-jet path (the trainer default)
    opt = optax.adam(1e-3)
    params = model.params
    opt_state = opt.init(params)

    def step(params, opt_state, key):
        key, ks, kl = jax.random.split(key, 3)
        x, t = pde.generate_collocation_points(ks, batch, "uniform")
        loss, grads = jax.value_and_grad(
            lambda p: pde.compute_loss(model.apply, p, x, t, key=kl)["total"]
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, key, loss

    return jax.jit(step), params, opt_state


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pde", default="burgers")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--mapping", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    step, params, opt_state = build_step(args.pde, args.batch, args.hidden, args.mapping)
    key = jax.random.PRNGKey(0)

    # Compile + XLA cost analysis.
    lowered = step.lower(params, opt_state, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = float(cost.get("flops", float("nan")))

    # Warm up, then time.
    params, opt_state, key, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, key, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)
    wall = (time.perf_counter() - t0) / args.iters

    achieved = flops / wall
    out = {
        "pde": args.pde,
        "batch": args.batch,
        "hidden": args.hidden,
        "mapping_size": args.mapping,
        "step_wall_s": wall,
        "xla_flops_per_step": flops,
        "achieved_flops_per_s": achieved,
        "mfu_vs_bf16_peak": achieved / PEAK_BF16,
        "mfu_vs_f32_est_peak": achieved / PEAK_F32_EST,
        "points_per_sec": args.batch / wall,
        "backend": jax.default_backend(),
        "bytes_accessed_per_step": float(cost.get("bytes accessed", float("nan"))),
    }
    outdir = Path(__file__).resolve().parent.parent / "benchmark_results"
    outdir.mkdir(exist_ok=True)
    (outdir / f"profile_{args.pde}.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))

    if args.trace:
        trace_dir = outdir / "profile_trace"
        with jax.profiler.trace(str(trace_dir)):
            for _ in range(5):
                params, opt_state, key, loss = step(params, opt_state, key)
            jax.block_until_ready(loss)
        print(f"trace written to {trace_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
