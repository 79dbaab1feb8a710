"""Jacobi elliptic functions (ops/special.py) and the nonlinear-pendulum
exact solution built on them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.ops.special import ellipj, ellipk, pendulum_theta

scipy_special = pytest.importorskip("scipy.special")


@pytest.mark.parametrize("m", [0.0, 0.06, 0.25, 0.5, 0.9])
def test_ellipj_matches_scipy(m):
    u = np.linspace(-12.0, 12.0, 201)
    sn, cn, dn = ellipj(jnp.asarray(u), m)
    sn_ref, cn_ref, dn_ref, _ = scipy_special.ellipj(u, m)
    assert np.abs(np.asarray(sn) - sn_ref).max() < 5e-6
    assert np.abs(np.asarray(cn) - cn_ref).max() < 5e-6
    # dn = cos(phi_0)/cos(phi_1 - phi_0) divides two near-equal f32 values.
    assert np.abs(np.asarray(dn) - dn_ref).max() < 5e-5


def test_ellipk_matches_scipy():
    for m in [0.0, 0.1, 0.5, 0.9]:
        assert float(ellipk(m)) == pytest.approx(float(scipy_special.ellipk(m)), abs=1e-6)


def test_ellipj_identity_sn2_cn2():
    u = jnp.linspace(-5.0, 5.0, 101)
    sn, cn, dn = ellipj(u, 0.4)
    np.testing.assert_allclose(np.asarray(sn**2 + cn**2), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dn**2 + 0.4 * sn**2), 1.0, atol=1e-5)


def test_ellipj_jittable_and_differentiable():
    f = jax.jit(lambda u: ellipj(u, 0.3)[0])
    u = jnp.array(1.2)
    assert np.isfinite(float(f(u)))
    g = jax.grad(lambda u: ellipj(u, 0.3)[0])(u)
    # d sn/du = cn * dn
    _, cn, dn = ellipj(u, 0.3)
    assert float(g) == pytest.approx(float(cn * dn), abs=1e-5)


def test_pendulum_theta_initial_conditions():
    omega = jnp.sqrt(9.81)
    t = jnp.zeros((1,))
    assert float(pendulum_theta(t, 0.5, omega)[0]) == pytest.approx(0.5, abs=1e-6)
    vel = jax.jvp(lambda tt: pendulum_theta(tt, 0.5, omega), (t,), (jnp.ones((1,)),))[1]
    assert abs(float(vel[0])) < 1e-5


def test_pendulum_theta_solves_ode():
    """theta'' + omega^2 sin theta = 0 pointwise, via nested AD."""
    omega = float(jnp.sqrt(9.81))

    def theta(t):
        return pendulum_theta(t, 0.5, omega)

    ts = jnp.linspace(0.1, 9.9, 50)
    d2 = jax.vmap(lambda t: jax.grad(jax.grad(lambda s: theta(s).sum()))(t))(ts)
    res = d2 + omega**2 * jnp.sin(jax.vmap(theta)(ts))
    assert float(jnp.abs(res).max()) < 5e-3  # f32 second derivative noise


def test_pendulum_small_amplitude_reduces_to_cosine():
    omega = 2.0
    ts = jnp.linspace(0.0, 5.0, 64)
    th = pendulum_theta(ts, 1e-3, omega)
    np.testing.assert_allclose(
        np.asarray(th), 1e-3 * np.cos(omega * np.asarray(ts)), atol=1e-8
    )


def test_pendulum_elliptic_exact_in_pde():
    from pinnrl_tpu.benchmarks.convergence import build_recipe_config
    from pinnrl_tpu.pdes import create_pde

    cfg = build_recipe_config("pendulum_nonlinear")
    assert cfg.pde.parameters.get("linearized", False) is False
    pde = create_pde(cfg)
    x = jnp.zeros((5, 1))
    t = jnp.linspace(0.0, 10.0, 5).reshape(-1, 1)
    u = pde.exact_solution(x, t)
    assert u.shape == (5, 1)
    assert float(u[0, 0]) == pytest.approx(0.5, abs=1e-6)
    assert float(jnp.abs(u).max()) <= 0.5 + 1e-6  # amplitude bound


def test_rar_power_and_floor_kwargs():
    from pinnrl_tpu.sampling.strategies import sample_residual_based

    key = jax.random.PRNGKey(0)
    domain = [(-1.0, 1.0)]
    res_fn = lambda x, t: jnp.exp(-((x[:, 0:1] - 0.5) ** 2) / 0.01)
    for power, floor, pool in [(1.0, 1.0, 4), (2.0, 0.5, 4), (0.5, 2.0, 8)]:
        x, t = sample_residual_based(
            key, 256, domain, (0.0, 1.0), residual_fn=res_fn,
            power=power, uniform_floor=floor, pool_factor=pool,
        )
        assert x.shape == (256, 1) and t.shape == (256, 1)
        assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    # sharper power concentrates more mass near the bump
    xs = {}
    for power in (0.5, 4.0):
        x, _ = sample_residual_based(
            key, 4096, domain, (0.0, 1.0), residual_fn=res_fn,
            power=power, uniform_floor=0.0,
        )
        xs[power] = float(jnp.mean(jnp.abs(x[:, 0] - 0.5) < 0.2))
    assert xs[4.0] > xs[0.5]
