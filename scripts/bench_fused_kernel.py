"""A/B the fused fwd+bwd Pallas residual kernel against the XLA path on a
shipping recipe's full train step (VERDICT r4 job #3: measure KdV-class
workloads — order-3 jets + causal weighting — or measure them off).

    python scripts/bench_fused_kernel.py kdv            # recipe config A/B
    python scripts/bench_fused_kernel.py kdv --tile 32  # VMEM tile sizing
    python scripts/bench_fused_kernel.py kdv --arm fused --tile 64

Prints one JSON line per run with ms/step and pts/sec for each arm; feed
the numbers into benchmark_results/fused_kernel_ab.json by hand (the file
carries measurement provenance notes).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def build(pde_key: str, fused: bool, tile, batch, causal):
    import jax

    from pinnrl_tpu.benchmarks.convergence import build_recipe_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = build_recipe_config(pde_key)
    if batch:
        cfg.training.batch_size = batch
    if causal is not None:
        cfg.training.causal_eps = causal
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)
    if fused:
        eps = float(getattr(cfg.training, "causal_eps", 0.0) or 0.0)
        if not fused_step.supports(model, pde, cfg.training):
            raise SystemExit(f"fused kernel unsupported for {pde_key}")
        pde._fused_causal = eps > 0.0
        pde._fused_residual_loss = fused_step.make_fused_residual_loss(
            model, pde, causal_eps=eps, tile=tile,
        )
    return cfg, pde, model


def measure(cfg, pde, model, inner=20, reps=5):
    import jax
    import optax

    batch = int(cfg.training.batch_size)
    opt = optax.adam(2e-3)

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
        return jax.lax.scan(one_step, carry, None, length=inner)

    carry = (model.params, opt.init(model.params), jax.random.PRNGKey(0))
    carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0
    steps = reps * inner
    return {
        "ms_per_step": round(1e3 * wall / steps, 3),
        "pts_per_sec": round(steps * batch / wall, 1),
        "final_loss": float(losses[-1]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pde", nargs="?", default="kdv")
    ap.add_argument("--arm", choices=["both", "xla", "fused"], default="both")
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--causal", type=float, default=None,
                    help="override recipe causal_eps (0 disables)")
    args = ap.parse_args()

    out = {"pde": args.pde, "tile": args.tile}
    if args.arm in ("both", "xla"):
        cfg, pde, model = build(args.pde, False, args.tile, args.batch, args.causal)
        out["xla"] = measure(cfg, pde, model)
        out["batch"] = int(cfg.training.batch_size)
        out["causal_eps"] = float(getattr(cfg.training, "causal_eps", 0.0) or 0.0)
    if args.arm in ("both", "fused"):
        cfg, pde, model = build(args.pde, True, args.tile, args.batch, args.causal)
        out["fused"] = measure(cfg, pde, model)
        out["batch"] = int(cfg.training.batch_size)
        out["causal_eps"] = float(getattr(cfg.training, "causal_eps", 0.0) or 0.0)
    if "xla" in out and "fused" in out:
        out["speedup"] = round(
            out["xla"]["ms_per_step"] / out["fused"]["ms_per_step"], 3
        )
    print("ABRESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
