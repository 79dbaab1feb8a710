"""Headline benchmark: Burgers collocation-points/sec/chip vs torch-CPU reference.

Runs the fused jitted training step (uniform sampling -> residual/BC/IC loss
via the forward-mode derivative engine -> grad -> Adam update) for a
Fourier-features MLP 64x3 (mapping 32) on Burgers at batch 2048 — the same
workload measured for the reference implementation by
scripts/measure_torch_baseline.py (result recorded in bench_baseline.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


def main() -> None:
    import jax
    import optax

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde

    baseline_file = Path(__file__).parent / "bench_baseline.json"
    baseline = json.loads(baseline_file.read_text())["torch_cpu_pts_per_sec"]

    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params["mapping_size"] = 32
    # Match the reference workload exactly: its base compute_loss evaluates
    # BCs on 100 points per face and the IC on 100 points
    # (reference: pde_base.py:1100-1140), independent of config.
    cfg.training.num_boundary_points = 200
    cfg.training.num_initial_points = 100
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    # Stacked-jet residual fast path (same numerics, one matmul per layer
    # for all derivative streams) — what the trainer attaches by default.
    pde.attach_fast_bundle(model)
    opt = optax.adam(2e-3)
    BATCH = 2048

    INNER = 50  # steps fused per device call (the trainer's lax.scan epoch)

    def one_step(carry, _):
        params, opt_state, key = carry
        key, k_s, k_l = jax.random.split(key, 3)
        x, t = pde.generate_collocation_points(k_s, BATCH)
        loss, grads = jax.value_and_grad(
            lambda p: pde.compute_loss(model.apply, p, x, t, key=k_l)["total"]
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    @jax.jit
    def epoch(carry):
        return jax.lax.scan(one_step, carry, None, length=INNER)

    carry = (model.params, opt.init(model.params), jax.random.PRNGKey(0))

    # Warm-up compile.
    carry, losses = epoch(carry)
    jax.block_until_ready(losses)

    n_epochs = 10
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0

    pts_per_sec = n_epochs * INNER * BATCH / wall
    print(
        json.dumps(
            {
                "metric": "burgers_collocation_pts_per_sec_per_chip",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
