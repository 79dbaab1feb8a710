"""Pallas kernel tests (CPU fallback paths; TPU paths exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.ops.kernels import fourier_features, fused_mlp_score
from pinnrl_tpu.rl.dqn import DQNNetwork


def test_fourier_features_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    B = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    out = fourier_features(x, B)
    proj = 2 * jnp.pi * (x @ B)
    ref = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fourier_features_nested_jvp():
    """Orders 1-3 of the custom_jvp rule must match the plain-jnp reference."""
    B = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    v = jnp.array([1.0, 0.0])
    z0 = jnp.array([0.3, 0.7])

    def nest(f, k):
        for _ in range(k):
            f = (lambda g: (lambda z: jax.jvp(g, (z,), (v,))[1]))(f)
        return f

    u_k = lambda z: jnp.sum(fourier_features(z.reshape(1, 2), B)[0, :4])

    def u_ref(z):
        proj = 2 * jnp.pi * (z.reshape(1, 2) @ B)
        return jnp.sum(jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)[0, :4])

    for order in (1, 2, 3):
        a, b = float(nest(u_k, order)(z0)), float(nest(u_ref, order)(z0))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fourier_features_grad_through_x():
    B = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    g = jax.grad(lambda z: jnp.sum(fourier_features(z, B)))(jnp.ones((4, 2)))
    assert g.shape == (4, 2)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_fused_mlp_score_matches_network():
    net = DQNNetwork(action_dim=1, hidden_dim=32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))["params"]
    grid = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    s1 = fused_mlp_score(grid, params)
    s2 = net.apply({"params": params}, grid)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)
