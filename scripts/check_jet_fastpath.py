"""Cross-check the stacked-jet fast residual path against the generic one.

Runs every bundle-compatible PDE with the fourier architecture and compares
residuals and parameter gradients between the BundleView fast path and the
per-point nested-jvp path. CPU-only (safe to run while the TPU is busy).
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from pinnrl_tpu.config import load_config  # noqa: E402
from pinnrl_tpu.models import PINNModel  # noqa: E402
from pinnrl_tpu.pdes import create_pde  # noqa: E402

PDES = [
    "burgers", "heat", "heat_2d", "wave", "kdv", "convection",
    "allen_cahn", "black_scholes", "pendulum", "cahn_hilliard",
]


def main() -> int:
    bad = 0
    for pde_name in PDES:
        cfg = load_config(pde_type=pde_name, architecture="fourier")
        cfg.model.hidden_dims = [32, 32]
        cfg.model.arch_params["mapping_size"] = 16
        pde = create_pde(cfg)
        model = PINNModel(cfg, seed=0)
        x, t = pde.generate_collocation_points(jax.random.PRNGKey(1), 64)
        r_slow = pde.compute_residual(model.apply, model.params, x, t)
        on = pde.attach_fast_bundle(model)
        r_fast = pde.compute_residual(model.apply, model.params, x, t)
        err = float(jnp.max(jnp.abs(r_fast - r_slow)))
        rel = err / (float(jnp.max(jnp.abs(r_slow))) + 1e-12)

        def loss_of(p):
            return jnp.mean(pde.compute_residual(model.apply, p, x, t) ** 2)

        g_fast = jax.grad(loss_of)(model.params)
        pde._fast_bundle_fn = None
        g_slow = jax.grad(loss_of)(model.params)
        gerr = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(g_fast), jax.tree_util.tree_leaves(g_slow)
            )
        )
        gscale = max(
            float(jnp.max(jnp.abs(a))) for a in jax.tree_util.tree_leaves(g_slow)
        )
        grel = gerr / (gscale + 1e-12)
        status = "OK" if (rel < 1e-4 and grel < 1e-3) or not on else "FAIL"
        if status == "FAIL":
            bad += 1
        print(
            f"{pde_name:14s} fast={int(on)} res_rel={rel:.2e} "
            f"grad_rel={grel:.2e} {status}"
        )
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
