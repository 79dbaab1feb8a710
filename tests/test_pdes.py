"""PDE layer tests: exact solutions satisfy their residuals, loss assembly,
BC/IC targets (analog of reference tests/unit_tests/test_pdes.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import PDE_REGISTRY, create_pde
from tests.test_utils import tiny_config

ALL_PDES = [
    "heat", "wave", "burgers", "kdv", "convection",
    "allen_cahn", "cahn_hilliard", "black_scholes", "pendulum",
]


@pytest.mark.parametrize("pde_type", ALL_PDES + ["heat_2d"])
def test_loss_keys_and_finiteness(pde_type):
    cfg = tiny_config(pde_type=pde_type)
    pde = create_pde(cfg)
    model = PINNModel(cfg)
    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 16)
    losses = pde.compute_loss(model.apply, model.params, x, t, key=key)
    assert set(losses) == {"residual", "boundary", "initial", "smoothness",
                           "gpinn", "data", "total"}
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), f"{pde_type}:{k} not finite"


# Exact solutions that genuinely satisfy their PDE: residual of the exact
# field must vanish (the sharp version of the reference's smoke checks).
EXACT_SATISFIES = ["heat", "wave", "convection", "kdv"]


@pytest.mark.parametrize("pde_type", EXACT_SATISFIES)
def test_exact_solution_has_zero_residual(pde_type):
    cfg = tiny_config(pde_type=pde_type)
    pde = create_pde(cfg)

    def exact_apply(params, z):
        z2 = jnp.atleast_2d(z)
        x, t = z2[:, : pde.dimension], z2[:, pde.dimension :]
        u = pde.exact_solution(x, t)
        return u.reshape(z.shape[:-1] + (1,)) if z.ndim == 1 else u

    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 64)
    r = pde.compute_residual(exact_apply, None, x, t)
    scale = float(jnp.max(jnp.abs(pde.exact_solution(x, t)))) + 1e-6
    assert float(jnp.max(jnp.abs(r))) / scale < 1e-2, f"{pde_type} residual too large"


def test_heat_2d_exact_zero_residual():
    cfg = tiny_config(pde_type="heat_2d")
    pde = create_pde(cfg)

    def exact_apply(params, z):
        z2 = jnp.atleast_2d(z)
        x, t = z2[:, :2], z2[:, 2:]
        u = pde.exact_solution(x, t)
        return u.reshape(z.shape[:-1] + (1,)) if z.ndim == 1 else u

    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 32)
    r = pde.compute_residual(exact_apply, None, x, t)
    assert float(jnp.max(jnp.abs(r))) < 1e-2


def test_registry_covers_all():
    for pde_type in ALL_PDES:
        assert pde_type in PDE_REGISTRY


def test_factory_aliases():
    from pinnrl_tpu.pdes.base import PDEBase

    cfg = tiny_config(pde_type="allen_cahn")
    pde = PDEBase.create("AllenCahn", cfg.pde, cfg.training)
    assert pde.pde_type == "allen_cahn"
    with pytest.raises(ValueError):
        PDEBase.create("navier_stokes", cfg.pde, cfg.training)


def test_black_scholes_payoff_ic():
    cfg = tiny_config(pde_type="black_scholes")
    pde = create_pde(cfg)
    ic = pde.boundary_conditions["initial"]
    x = jnp.array([[50.0], [150.0]])
    t = jnp.zeros((2, 1))
    target = ic(x, t)
    np.testing.assert_allclose(np.asarray(target).ravel(), [0.0, 50.0])


def test_pendulum_energy_and_phase_space():
    cfg = tiny_config(pde_type="pendulum")
    pde = create_pde(cfg)
    model = PINNModel(cfg)
    x = jnp.zeros((8, 1))
    t = jnp.linspace(0, 1, 8).reshape(-1, 1)
    E = pde.compute_energy(model.apply, model.params, x, t)
    assert E.shape == (8, 1) and bool(jnp.all(E >= 0))
    theta, theta_t = pde.compute_phase_space(model.apply, model.params, x, t)
    assert theta.shape == theta_t.shape == (8, 1)


def test_validate_metrics():
    cfg = tiny_config(pde_type="wave")
    pde = create_pde(cfg)
    model = PINNModel(cfg)
    m = pde.validate(model.apply, model.params, num_points=64)
    assert {"l2_error", "max_error", "mean_error", "rel_l2"} <= set(m)
    assert all(np.isfinite(v) for v in m.values())


def test_synthetic_observations_use_true_params():
    cfg = tiny_config(pde_type="heat")
    cfg.pde.trainable_parameters = ["alpha"]
    cfg.pde.parameter_initial_guesses = {"alpha": 0.5}
    pde = create_pde(cfg)
    pde.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=32, noise=0.0)
    x_obs, t_obs, u_obs = pde.observations
    # Targets must encode the TRUE alpha (0.01), not the 0.5 guess.
    expected = pde.exact_solution(x_obs, t_obs, coeffs=None)
    np.testing.assert_allclose(np.asarray(u_obs), np.asarray(expected), rtol=1e-5)
    wrong = pde.exact_solution(x_obs, t_obs, coeffs={"alpha": jnp.asarray(0.5)})
    assert not np.allclose(np.asarray(u_obs), np.asarray(wrong))


def test_coeff_trainable_vs_static():
    cfg = tiny_config(pde_type="heat")
    cfg.pde.trainable_parameters = ["alpha"]
    cfg.pde.parameter_initial_guesses = {"alpha": 0.5}
    pde = create_pde(cfg)
    coeffs = pde.init_coeffs()
    assert float(coeffs["alpha"]) == 0.5
    assert pde.coeff(coeffs, "alpha") is coeffs["alpha"]
    assert pde.coeff(None, "alpha") == 0.01  # static true value


def test_exact_dirichlet_bc_targets_exact_solution():
    cfg = tiny_config(pde_type="kdv")
    cfg.pde.boundary_conditions = {"dirichlet": {"type": "exact"}}
    pde = create_pde(cfg)
    bc = pde.boundary_conditions["dirichlet"]
    x = jnp.array([[-15.0], [15.0], [15.0]])
    t = jnp.array([[0.0], [2.5], [5.0]])
    np.testing.assert_allclose(
        np.asarray(bc(x, t)), np.asarray(pde.exact_solution(x, t)), rtol=1e-6
    )
    # The tail is small but NOT zero at the right boundary late in time.
    assert float(bc(x, t)[2, 0]) > 1e-6


def test_exact_initial_condition_matches_exact_solution():
    cfg = tiny_config(pde_type="wave")
    cfg.pde.initial_condition = {"type": "exact"}
    pde = create_pde(cfg)
    ic = pde.boundary_conditions["initial"]
    x = jnp.linspace(0.0, 1.0, 9).reshape(-1, 1)
    t = jnp.zeros((9, 1))
    np.testing.assert_allclose(
        np.asarray(ic(x, t)), np.asarray(pde.exact_solution(x, t)), rtol=1e-6
    )


def test_exact_bc_requires_exact_solution():
    cfg = tiny_config(pde_type="heat")
    cfg.pde.exact_solution = None
    cfg.pde.boundary_conditions = {"dirichlet": {"type": "exact"}}
    with pytest.raises(ValueError, match="exact"):
        create_pde(cfg)


def test_heat_initial_points_anchor_at_window_start():
    # Regression: heat's edge-concentrated 1D IC layout pinned t to literal 0;
    # time-marching windows need the IC at time_domain[0].
    cfg = tiny_config(pde_type="heat")
    cfg.pde.time_domain = [1.5, 2.0]
    pde = create_pde(cfg)
    _, t_i = pde._sample_initial_points(jax.random.PRNGKey(0), 8)
    np.testing.assert_allclose(np.asarray(t_i), 1.5)


def test_black_scholes_strike_focused_ic_sampling():
    """Round-5 payoff-kink lever: ic_strike_focus concentrates a fraction
    of the initial points around the strike (the diagnosed max-error
    site); points stay in-domain and the IC loss remains finite."""
    import numpy as np

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="black_scholes", architecture="fourier")
    cfg.pde.parameters.update(
        {"ic_strike_focus": 0.5, "ic_strike_width": 5.0,
         "time_convention": "to_maturity"}
    )
    cfg.pde.exact_solution = {"type": "black_scholes", "strike": 100.0,
                              "option_type": "call", "cdf": True}
    pde = create_pde(cfg)
    x, t = pde._sample_initial_points(jax.random.PRNGKey(0), 512)
    assert x.shape == (512, 1) and t.shape == (512, 1)
    (lo, hi) = pde.domain[0]
    xs = np.asarray(x).reshape(-1)
    assert xs.min() >= lo and xs.max() <= hi
    # Concentration: far more points within strike +- 2 widths than the
    # uniform density would put there (uniform: 20/200 of the mass).
    near = np.mean(np.abs(xs - 100.0) < 10.0)
    assert near > 0.3
    model = PINNModel(cfg, seed=0)
    xx, tt = pde.generate_collocation_points(jax.random.PRNGKey(1), 64)
    L = pde.compute_loss(model.apply, model.params, xx, tt,
                         key=jax.random.PRNGKey(2))
    assert np.isfinite(float(L["total"]))
