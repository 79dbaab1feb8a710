"""Cahn-Hilliard mass-conservation loss term (round-3/4 CH-dynamics lever)."""

import jax
import jax.numpy as jnp
import pytest

from pinnrl_tpu.benchmarks.convergence import build_recipe_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde


@pytest.fixture(scope="module")
def setup():
    cfg = build_recipe_config("cahn_hilliard_dynamics")
    cfg.pde.exact_solution.update({"nx": 64, "dt": 5e-3, "n_save": 16})
    cfg.training.loss_weights["mass"] = 10.0
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    return cfg, pde, model


def test_mass_term_present_and_positive(setup):
    cfg, pde, model = setup
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(0), 64)
    L = pde.compute_loss(model.apply, model.params, x, t, key=jax.random.PRNGKey(1))
    assert "mass" in L
    assert float(L["mass"]) > 0.0
    # And it contributes to the total.
    w = cfg.training.loss_weights["mass"]
    L0 = dict(L)
    cfg2 = build_recipe_config("cahn_hilliard_dynamics")
    cfg2.pde.exact_solution.update({"nx": 64, "dt": 5e-3, "n_save": 16})
    pde2 = create_pde(cfg2)  # mass weight 0 by default
    L2 = pde2.compute_loss(model.apply, model.params, x, t, key=jax.random.PRNGKey(1))
    assert "mass" not in L2
    assert float(L0["total"]) > float(L2["total"])


def test_mass_term_zero_for_exactly_conserving_field(setup):
    """A constant-in-time field trivially conserves mass: the penalty must
    be (near) zero when the prediction's spatial mean equals the IC's."""
    cfg, pde, _ = setup

    ic_fn = pde.boundary_conditions["initial"]

    class _Frozen:
        def apply(self, params, z):
            squeeze = z.ndim == 1
            z2 = z.reshape(1, -1) if squeeze else z
            x = z2[:, 0:1]
            u = ic_fn(x, jnp.zeros_like(x))
            out = jnp.concatenate([u, jnp.zeros_like(u)], axis=-1)
            return out[0] if squeeze else out

    frozen = _Frozen()
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(0), 32)
    L = pde.compute_loss(frozen.apply, None, x, t, key=jax.random.PRNGKey(1))
    assert float(L["mass"]) < 1e-8


def test_mass_term_jittable(setup):
    cfg, pde, model = setup
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(0), 64)
    total = jax.jit(
        lambda p: pde.compute_loss(model.apply, p, x, t, key=jax.random.PRNGKey(1))["total"]
    )(model.params)
    assert jnp.isfinite(total)
