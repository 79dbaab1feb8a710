"""Cross-PDE consistency matrix (reference: tests/unit_tests/test_pdes.py —
the 1251-line per-PDE suite; this file covers its structural invariants):
well-posedness (exact trace at t=0 equals the IC), validate()-metric
correctness against the exact solution, parameter plumbing into residuals,
and per-architecture gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde

WELL_POSED = ["heat", "wave", "kdv"]  # default configs trace exact at t=0


@pytest.mark.parametrize("pde_type", WELL_POSED)
def test_ic_matches_exact_at_t0(pde_type):
    cfg = load_config(pde_type=pde_type, architecture="feedforward")
    pde = create_pde(cfg)
    ic_fn = pde.boundary_conditions.get("initial")
    assert ic_fn is not None
    x = jnp.linspace(pde.domain[0][0], pde.domain[0][1], 64).reshape(-1, 1)
    t0 = jnp.zeros_like(x)
    exact = pde.exact_solution(x, t0)
    assert exact is not None
    ic = ic_fn(x, t0)
    scale = float(jnp.max(jnp.abs(exact))) + 1e-12
    assert float(jnp.max(jnp.abs(exact - ic))) / scale < 1e-5, (
        f"{pde_type}: IC and exact solution disagree at t=0 (ill-posed setup)"
    )


def test_burgers_traveling_wave_ic_matches_exact():
    cfg = load_config(pde_type="burgers", architecture="feedforward")
    cfg.pde.exact_solution = {
        "type": "traveling_wave", "amplitude": 0.5, "speed": 0.5, "center": -0.25,
    }
    cfg.pde.initial_condition = {"type": "traveling_wave"}
    pde = create_pde(cfg)
    x = jnp.linspace(pde.domain[0][0], pde.domain[0][1], 64).reshape(-1, 1)
    t0 = jnp.zeros_like(x)
    exact = pde.exact_solution(x, t0)
    ic = pde.boundary_conditions["initial"](x, t0)
    np.testing.assert_allclose(np.asarray(ic), np.asarray(exact), atol=1e-6)


@pytest.mark.parametrize("pde_type", WELL_POSED + ["heat_2d"])
def test_validate_is_zero_on_exact_solution(pde_type):
    """validate()'s rel_l2/max_error must vanish when the 'model' IS the
    exact solution — a correctness check of the metric computation itself."""
    cfg = load_config(pde_type=pde_type, architecture="feedforward")
    pde = create_pde(cfg)

    def exact_apply(params, z):
        return pde.exact_solution(z[:, :-1], z[:, -1:])

    val = pde.validate(exact_apply, None, num_points=2000)
    assert val["rel_l2"] < 1e-5
    assert val["max_error"] < 1e-4
    # has_nan is a heat-specific extra; assert it only where present.
    if "has_nan" in val:
        assert val["has_nan"] == 0.0


def test_viscosity_changes_burgers_residual():
    cfg = load_config(pde_type="burgers", architecture="feedforward")
    pde = create_pde(cfg)

    # compute_residual evaluates apply_fn POINTWISE (z has shape (dim+1,)),
    # so test fields index the last axis.
    def u(params, z):  # curved-in-x field so the laplacian term is nonzero
        return jnp.sin(jnp.pi * z[..., 0]) * (1.0 + z[..., -1])

    x = jnp.linspace(0.1, 0.9, 32).reshape(-1, 1)
    t = jnp.full_like(x, 0.3)
    r_small = pde.compute_residual(u, None, x, t, {"nu": 0.001})
    r_big = pde.compute_residual(u, None, x, t, {"nu": 1.0})
    assert float(jnp.max(jnp.abs(r_small - r_big))) > 1e-3


def test_heat_diffusivity_coeff_plumbed():
    cfg = load_config(pde_type="heat", architecture="feedforward")
    pde = create_pde(cfg)

    def u(params, z):
        return jnp.sin(jnp.pi * z[..., 0]) * jnp.exp(-z[..., -1])

    x = jnp.linspace(0.1, 0.9, 32).reshape(-1, 1)
    t = jnp.full_like(x, 0.2)
    keys = set(pde.parameters)
    name = "alpha" if "alpha" in keys else ("diffusivity" if "diffusivity" in keys else None)
    assert name is not None, f"heat parameters missing diffusivity: {keys}"
    r1 = pde.compute_residual(u, None, x, t, {name: 0.1})
    r2 = pde.compute_residual(u, None, x, t, {name: 2.0})
    assert float(jnp.max(jnp.abs(r1 - r2))) > 1e-3


ARCHS = [
    "feedforward", "fourier", "siren", "resnet", "attention", "fno", "autoencoder",
]


@pytest.mark.parametrize("arch", ARCHS)
def test_gradient_flow_every_architecture(arch):
    """Every architecture must propagate nonzero finite gradients through the
    full PINN loss (reference: test_neural_networks.py gradient checks)."""
    cfg = load_config(pde_type="heat", architecture=arch)
    cfg.model.hidden_dims = [16, 16]
    for k, v in dict(
        mapping_size=8, hidden_dim=16, num_blocks=2, num_layers=2, modes=4, latent_dim=8
    ).items():
        cfg.model.arch_params.setdefault(k, v)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(0), 64, "uniform")

    def loss(p):
        return pde.compute_loss(model.apply, p, x, t, key=jax.random.PRNGKey(1))["total"]

    grads = jax.grad(loss)(model.params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    total_norm = sum(float(jnp.sum(g**2)) for g in leaves) ** 0.5
    assert total_norm > 1e-8, f"{arch}: zero gradient through PINN loss"


@pytest.mark.parametrize("pde_type", ["allen_cahn", "cahn_hilliard", "convection",
                                      "black_scholes", "pendulum"])
def test_residual_finite_on_generic_field(pde_type):
    """PDEs without closed-form exact solutions: residual of a smooth field
    must be finite and have the right shape."""
    cfg = load_config(pde_type=pde_type, architecture="feedforward")
    pde = create_pde(cfg)

    def u(params, z):
        return jnp.tanh(z[..., 0]) * jnp.exp(-0.5 * z[..., -1])

    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 32, "uniform")
    r = pde.compute_residual(u, None, x, t)
    assert r.shape[0] == 32
    assert bool(jnp.isfinite(r).all()), f"{pde_type}: non-finite residual"


# ----------------------------- Cahn-Hilliard stationary interface (4th order)


def _ch_pde(exact_type, dimension=1):
    cfg = load_config(pde_type="cahn_hilliard", architecture="feedforward")
    cfg.pde.exact_solution = {"type": exact_type}
    if dimension == 2:
        cfg.pde.dimension = 2
        cfg.pde.domain = [[-0.5, 0.5], [-0.5, 0.5]]
        cfg.model.input_dim = 3
    else:
        cfg.pde.domain = [[-0.5, 0.5]]
    return create_pde(cfg)


@pytest.mark.parametrize("dimension", [1, 2])
def test_ch_stationary_interface_residual_vanishes(dimension):
    """u = tanh(x/(sqrt(2) eps)) is an EXACT CH solution (mu = 0 identically)
    in any dimension; the 4th-order forward-AD residual must be ~0 on it,
    while the reference-parity tanh(x/(2 eps)) profile has O(1) residual."""
    pde = _ch_pde("stationary_interface", dimension)
    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 64, "uniform")

    def exact_apply(params, z):
        return pde.exact_solution(z[..., :dimension].reshape(-1, dimension),
                                  z[..., dimension:].reshape(-1, 1))

    r_exact = pde.compute_residual(exact_apply, None, x, t)
    assert bool(jnp.isfinite(r_exact).all())
    assert float(jnp.max(jnp.abs(r_exact))) < 0.05, (
        "stationary interface should zero the CH residual"
    )

    pde_parity = _ch_pde("tanh", dimension)

    def parity_apply(params, z):
        return pde_parity.exact_solution(
            z[..., :dimension].reshape(-1, dimension),
            z[..., dimension:].reshape(-1, 1),
        )

    r_parity = pde_parity.compute_residual(parity_apply, None, x, t)
    assert float(jnp.max(jnp.abs(r_parity))) > 1.0, (
        "parity tanh(x/(2 eps)) is not a CH solution; residual must be O(1)"
    )


def test_ch_stationary_interface_bc_ic_trace_exact():
    pde = _ch_pde("stationary_interface", 2)
    x = jnp.stack([jnp.linspace(-0.5, 0.5, 16), jnp.full((16,), 0.5)], axis=1)
    t = jnp.zeros((16, 1))
    exact = pde.exact_solution(x, t)
    bc = pde.boundary_conditions["dirichlet"](x, t)
    ic = pde.boundary_conditions["initial"](x, t)
    np.testing.assert_allclose(np.asarray(bc), np.asarray(exact), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ic), np.asarray(exact), atol=1e-6)


def test_ch_recipe_builds_2d_attention():
    from pinnrl_tpu.benchmarks.convergence import build_recipe_config

    cfg = build_recipe_config("cahn_hilliard", epochs=2)
    assert cfg.pde.dimension == 2
    assert cfg.model.input_dim == 3
    assert cfg.model.architecture == "attention"
    assert cfg.pde.exact_solution["type"] == "stationary_interface"
