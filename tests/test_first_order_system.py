"""Auxiliary first-order system formulation (KdV): correctness tests.

The system form replaces the order-3 jet with first-order jvps over a
3-channel head (u, p=u_x, q=u_xx); these tests pin the residual algebra to
the analytic soliton and to the direct formulation.
"""

import jax
import jax.numpy as jnp
import pytest

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde


def _kdv_cfg(first_order: bool):
    cfg = load_config(pde_type="kdv", architecture="fourier")
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params["mapping_size"] = 8
    if first_order:
        cfg.pde.parameters["formulation"] = "first_order"
        cfg.model.output_dim = 3
        cfg.pde.output_dim = 3
    return cfg


def _soliton_chain(c=1.0):
    """Analytic (u, u_x, u_xx) of the KdV soliton as a fake 3-channel net."""

    def u_scalar(z):
        arg = 0.5 * jnp.sqrt(c) * (z[0] - c * z[1])
        return 0.5 * c / jnp.cosh(arg) ** 2

    def apply_fn(params, z):
        z = jnp.reshape(z, (-1,))
        du = jax.grad(u_scalar)(z)[0]
        d2u = jax.grad(lambda zz: jax.grad(u_scalar)(zz)[0])(z)[0]
        return jnp.stack([u_scalar(z), du, d2u])

    return apply_fn


def test_system_size_flag():
    pde = create_pde(_kdv_cfg(True))
    assert pde.system_size == 3
    assert create_pde(_kdv_cfg(False)).system_size == 1


def test_soliton_chain_zeroes_system_residual():
    cfg = _kdv_cfg(True)
    pde = create_pde(cfg)
    apply_fn = _soliton_chain()
    x = jnp.linspace(-3.0, 3.0, 9).reshape(-1, 1)
    t = jnp.full((9, 1), 0.7)
    r = pde.compute_residual(apply_fn, None, x, t)
    assert r.shape == (9, 3)
    assert float(jnp.max(jnp.abs(r))) < 5e-4  # f32 nested-grad noise


def test_compatibility_residuals_catch_mismatch():
    cfg = _kdv_cfg(True)
    pde = create_pde(cfg)

    def bad_apply(params, z):
        z = jnp.reshape(z, (-1,))
        u = jnp.sin(z[0])
        return jnp.stack([u, jnp.cos(z[0]) + 0.5, -jnp.sin(z[0])])  # p off by 0.5

    r = pde.compute_residual(bad_apply, None, jnp.zeros((4, 1)), jnp.zeros((4, 1)))
    assert float(jnp.min(jnp.abs(r[:, 1]))) > 0.4  # r2 = p - u_x detects it


def test_system_loss_trains_jittable():
    cfg = _kdv_cfg(True)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    x = jnp.linspace(-1.0, 1.0, 32).reshape(-1, 1)
    t = jnp.full((32, 1), 0.5)

    @jax.jit
    def loss(params):
        return pde.compute_loss(model.apply, params, x, t, key=jax.random.PRNGKey(0))["total"]

    val = loss(model.params)
    assert jnp.isfinite(val)
    g = jax.grad(lambda p: loss(p))(model.params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in flat)


def test_residual_score_shapes_and_collapse():
    """residual_score is (N,) in BOTH formulations; the system form l2-collapses
    channels rather than flattening (N,3) into 3N bogus scores."""
    x = jnp.linspace(-1.0, 1.0, 8).reshape(-1, 1)
    t = jnp.full((8, 1), 0.3)

    pde_sys = create_pde(_kdv_cfg(True))
    apply_fn = _soliton_chain()
    s = pde_sys.residual_score(apply_fn, None, x, t)
    assert s.shape == (8,)
    r = pde_sys.compute_residual(apply_fn, None, x, t)
    expect = jnp.sqrt(jnp.sum(r * r, axis=1))
    assert jnp.allclose(s, expect)

    pde_dir = create_pde(_kdv_cfg(False))
    model = PINNModel(_kdv_cfg(False), seed=0)
    s1 = pde_dir.residual_score(model.apply, model.params, x, t)
    r1 = pde_dir.compute_residual(model.apply, model.params, x, t)
    assert s1.shape == (8,)
    assert jnp.allclose(s1, jnp.abs(r1.reshape(-1)))


def test_first_order_requires_1d():
    cfg = _kdv_cfg(True)
    cfg.pde.dimension = 2
    cfg.pde.domain = [[-1.0, 1.0], [-1.0, 1.0]]
    cfg.pde.input_dim = 3
    with pytest.raises(ValueError, match="dimension=1"):
        create_pde(cfg)


# --------------------------------------------------------------------- #
# Cahn-Hilliard mixed (u, mu) formulation
# --------------------------------------------------------------------- #


def _ch_cfg(mixed: bool, dimension: int = 2):
    cfg = load_config(pde_type="cahn_hilliard", architecture="fourier")
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params["mapping_size"] = 8
    if dimension == 2:
        cfg.pde.dimension = 2
        cfg.pde.domain = [[-0.5, 0.5], [-0.5, 0.5]]
        cfg.model.input_dim = 3
        cfg.pde.input_dim = 3
    if mixed:
        cfg.pde.parameters["formulation"] = "mixed"
        cfg.model.output_dim = 2
        cfg.pde.output_dim = 2
    return cfg


def _interface_pair(eps=0.1):
    """Analytic (u, mu) of the stationary interface as a fake 2-channel net.

    u = tanh(x0 / (sqrt(2) eps)) makes mu = u^3 - u - eps^2 lap(u) vanish
    identically, so the exact chemical-potential channel is zero."""
    a = jnp.sqrt(2.0) * eps

    def apply_fn(params, z):
        z = jnp.reshape(z, (-1,))
        return jnp.stack([jnp.tanh(z[0] / a), jnp.zeros(())])

    return apply_fn


def test_ch_mixed_system_size_flag():
    assert create_pde(_ch_cfg(True)).system_size == 2
    assert create_pde(_ch_cfg(False)).system_size == 1


def test_ch_interface_zeroes_mixed_residual():
    pde = create_pde(_ch_cfg(True))
    apply_fn = _interface_pair()
    x = jnp.stack(
        [jnp.linspace(-0.4, 0.4, 9), jnp.linspace(0.3, -0.3, 9)], axis=-1
    )
    t = jnp.full((9, 1), 0.5)
    r = pde.compute_residual(apply_fn, None, x, t)
    assert r.shape == (9, 2)
    assert float(jnp.max(jnp.abs(r))) < 5e-4


def test_ch_mixed_compatibility_catches_wrong_mu():
    pde = create_pde(_ch_cfg(True))

    def bad_apply(params, z):
        z = jnp.reshape(z, (-1,))
        return jnp.stack([jnp.tanh(z[0] / (jnp.sqrt(2.0) * 0.1)), jnp.ones(()) * 0.5])

    x = jnp.zeros((4, 2))
    t = jnp.zeros((4, 1))
    r = pde.compute_residual(bad_apply, None, x, t)
    assert float(jnp.min(jnp.abs(r[:, 1]))) > 0.4  # r2 = mu - mu(u) detects it


def test_ch_mixed_matches_direct_on_smooth_field():
    """r1 of the mixed form with the CONSISTENT mu channel equals the direct
    4th-order residual (up to f32 jet noise) for a smooth analytic field."""
    eps = 0.1

    def u_scalar(z):
        return jnp.sin(z[0]) * jnp.cos(z[1]) * jnp.exp(-z[2])

    def mu_scalar(z):
        lap_u = -2.0 * u_scalar(z)  # lap of sin(x)cos(y) factor
        u = u_scalar(z)
        return u**3 - u - eps**2 * lap_u

    def apply_vec(params, z):
        z = jnp.reshape(z, (-1,))
        return jnp.stack([u_scalar(z), mu_scalar(z)])

    def apply_dir(params, z):
        z = jnp.reshape(z, (-1,))
        return jnp.reshape(u_scalar(z), (1,))

    x = jnp.stack([jnp.linspace(-0.4, 0.4, 7), jnp.linspace(0.2, -0.2, 7)], axis=-1)
    t = jnp.full((7, 1), 0.3)
    r_mixed = create_pde(_ch_cfg(True)).compute_residual(apply_vec, None, x, t)
    r_dir = create_pde(_ch_cfg(False)).compute_residual(apply_dir, None, x, t)
    assert jnp.allclose(r_mixed[:, 0:1], r_dir, atol=2e-3)
    assert float(jnp.max(jnp.abs(r_mixed[:, 1]))) < 2e-3


def test_ch_mixed_loss_trains_jittable():
    cfg = _ch_cfg(True)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 2), minval=-0.5, maxval=0.5)
    t = jnp.full((32, 1), 0.5)

    @jax.jit
    def loss(params):
        return pde.compute_loss(model.apply, params, x, t, key=jax.random.PRNGKey(0))["total"]

    val = loss(model.params)
    assert jnp.isfinite(val)
    g = jax.grad(lambda p: loss(p))(model.params)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree_util.tree_leaves(g))
