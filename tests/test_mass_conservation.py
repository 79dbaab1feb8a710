"""Cahn-Hilliard mass-conservation loss term (round-3/4 CH-dynamics lever)."""

import jax
import jax.numpy as jnp
import numpy as np
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
    # The round-4 shipping recipe carries loss_weights.mass=100 by default;
    # zero it explicitly for the no-mass control.
    cfg2.training.loss_weights["mass"] = 0.0
    pde2 = create_pde(cfg2)
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


def test_mass_term_in_adaptive_weighted_total(setup):
    """Advisor round-3 medium: with adaptive weights enabled, the training
    gradient flows through _weighted_total, which must include the mass
    penalty (it was silently dropped)."""
    from pinnrl_tpu.training import PDETrainer

    cfg, pde, model = setup
    cfg.training.adaptive_weights.enabled = True
    trainer = PDETrainer(model, pde, cfg)
    w = jnp.array([1.0, 1.0, 1.0])
    base = {k: jnp.asarray(0.0) for k in
            ("residual", "boundary", "initial", "smoothness", "data")}
    lo = trainer._weighted_total({**base, "mass": jnp.asarray(0.0)}, w)
    hi = trainer._weighted_total({**base, "mass": jnp.asarray(1.0)}, w)
    # loss_weights.mass = 10.0 in the fixture config
    assert float(hi - lo) == pytest.approx(10.0, rel=1e-6)


def test_adaptive_weights_plus_mass_trains(setup):
    """End-to-end: adaptive weights + loss_weights.mass trains and the mass
    component appears in history (the combination the advisor flagged)."""
    import copy

    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from pinnrl_tpu.training import PDETrainer

    cfg = copy.deepcopy(setup[0])
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params["mapping_size"] = 8
    t = cfg.training
    t.num_epochs = 2
    t.batch_size = 32
    t.num_collocation_points = 64
    t.num_boundary_points = 16
    t.num_initial_points = 16
    t.validation_frequency = 1
    t.optimizer = "adam"
    t.adaptive_weights.enabled = True
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    res = PDETrainer(model, pde, cfg).train(seed=0)
    assert res["status"] == "completed"
    assert np.isfinite(res.get("final_loss", res.get("best_loss", 0.0)))


# --------------------------------------------------------------------- #
# μ-channel H²-weighted residual penalty (round-5 CH-dynamics lever)
# --------------------------------------------------------------------- #


def test_mu_h2_term_present_and_contributes(setup):
    cfg, _, model = setup
    cfg2 = build_recipe_config("cahn_hilliard_dynamics")
    cfg2.pde.exact_solution.update({"nx": 64, "dt": 5e-3, "n_save": 16})
    cfg2.training.loss_weights["mu_h2"] = 1.0
    pde2 = create_pde(cfg2)
    x, t = pde2.generate_collocation_points(jax.random.PRNGKey(0), 64)
    L = pde2.compute_loss(model.apply, model.params, x, t, key=jax.random.PRNGKey(1))
    assert "mu_h2" in L
    assert float(L["mu_h2"]) > 0.0
    assert np.isfinite(float(L["total"]))


def test_mu_h2_parseval_single_mode(setup):
    """Spectral Δr2 measurement is exact on a crafted single-mode residual:
    r2 = cos(m x) on [0, 2π) gives mean-square Δr2 = m⁴/2."""
    cfg2 = build_recipe_config("cahn_hilliard_dynamics")
    cfg2.pde.exact_solution.update({"nx": 64, "dt": 5e-3, "n_save": 16})
    cfg2.training.loss_weights["mu_h2"] = 1.0
    pde2 = create_pde(cfg2)

    m = 3

    def fake_residual(apply_fn, params, x, t, coeffs=None):
        r1 = jnp.zeros_like(x[:, 0:1])
        r2 = jnp.cos(m * x[:, 0:1])
        return jnp.concatenate([r1, r2], axis=-1)

    pde2.compute_residual = fake_residual
    losses = {"total": jnp.zeros(())}
    out = pde2._mu_h2_penalty(
        None, None, None, jax.random.PRNGKey(0), losses, active=1.0
    )
    assert float(out["mu_h2"]) == pytest.approx(m**4 / 2.0, rel=1e-5)
