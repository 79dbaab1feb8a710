"""Derivative engine tests: analytic verification of orders 1-4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.ops.derivatives import (
    batched_derivative_bundle,
    derivative_bundle,
    directional_derivative,
    laplacian,
)


def analytic_apply(params, z):
    # u(x, t) = sin(2x) * exp(-t)
    return jnp.array([jnp.sin(2 * z[..., 0]) * jnp.exp(-z[..., 1])])


@pytest.fixture(scope="module")
def batch():
    x = jnp.linspace(0.1, 1.0, 8).reshape(-1, 1)
    t = jnp.full((8, 1), 0.3)
    return x, t


@pytest.mark.parametrize("mode", ["jvp", "jet"])
def test_directional_orders(mode):
    u = lambda z: jnp.sin(2 * z[0]) * jnp.exp(-z[1])
    z = jnp.array([0.4, 0.2])
    d = directional_derivative(u, z, axis=0, order=4, mode=mode)
    s, c = np.sin(0.8), np.cos(0.8)
    e = np.exp(-0.2)
    np.testing.assert_allclose(d[0], 2 * c * e, rtol=1e-4)
    np.testing.assert_allclose(d[1], -4 * s * e, rtol=1e-4)
    np.testing.assert_allclose(d[2], -8 * c * e, rtol=1e-3)
    np.testing.assert_allclose(d[3], 16 * s * e, rtol=1e-3)


def test_bundle_keys_1d(batch):
    x, t = batch
    d = batched_derivative_bundle(
        analytic_apply, None, x, t, dimension=1,
        spatial_orders=(1, 2, 3), temporal_orders=(1, 2),
    )
    assert set(d) == {"u", "dt", "dt2", "dx", "dx2", "dx3", "laplacian"}
    for v in d.values():
        assert v.shape == (8, 1)
    xs = np.asarray(x).ravel()
    e = np.exp(-0.3)
    np.testing.assert_allclose(d["dt"].ravel(), -np.sin(2 * xs) * e, atol=1e-4)
    np.testing.assert_allclose(d["dx2"].ravel(), -4 * np.sin(2 * xs) * e, atol=1e-3)
    np.testing.assert_allclose(d["laplacian"].ravel(), d["dx2"].ravel())


def test_bundle_keys_2d():
    def apply2d(params, z):
        return jnp.array([jnp.sin(z[..., 0]) * jnp.cos(z[..., 1]) * z[..., 2]])

    x = jnp.array([[0.3, 0.7], [0.5, 0.1]])
    t = jnp.array([[1.0], [2.0]])
    d = batched_derivative_bundle(
        apply2d, None, x, t, dimension=2, spatial_orders=(1, 2), temporal_orders=(1,)
    )
    assert "dx1" in d and "dx2" in d and "dx1x1" in d and "dx2x2" in d
    # laplacian = -sin(x)cos(y)t - sin(x)cos(y)t
    expected = -2 * np.sin(np.asarray(x)[:, 0]) * np.cos(np.asarray(x)[:, 1]) * np.asarray(t).ravel()
    np.testing.assert_allclose(d["laplacian"].ravel(), expected, atol=1e-3)


def test_laplacian_direct():
    u = lambda z: z[0] ** 2 + 3 * z[1] ** 2
    lap = laplacian(u, jnp.array([1.0, 2.0]), spatial_axes=[0, 1])
    np.testing.assert_allclose(lap, 8.0, rtol=1e-5)


def test_bundle_under_jit_and_grad():
    """The engine must compose with jit and reverse-mode over parameters."""
    w = jnp.array(0.7)

    def apply_fn(params, z):
        return jnp.array([jnp.tanh(params * z[..., 0]) * z[..., 1]])

    def loss(params):
        u = lambda z: apply_fn(params, z)[0]
        d = derivative_bundle(u, jnp.array([0.5, 1.5]), dimension=1)
        return d["dx2"] ** 2 + d["dt"] ** 2

    g = jax.jit(jax.grad(loss))(w)
    assert np.isfinite(float(g))
