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


def test_fourier_features_jvp_order4():
    """Order-4 nesting (the Cahn-Hilliard derivative surface) of the
    custom_jvp rule must match plain jnp to f32 accuracy."""
    B = jax.random.normal(jax.random.PRNGKey(2), (2, 6)) * 0.5
    v = jnp.array([1.0, 0.0])
    z0 = jnp.array([0.2, 0.4])

    def nest(f, k):
        for _ in range(k):
            f = (lambda g: (lambda z: jax.jvp(g, (z,), (v,))[1]))(f)
        return f

    u_k = lambda z: jnp.sum(fourier_features(z.reshape(1, 2), B))

    def u_ref(z):
        proj = 2 * jnp.pi * (z.reshape(1, 2) @ B)
        return jnp.sum(jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1))

    a, b = float(nest(u_k, 4)(z0)), float(nest(u_ref, 4)(z0))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_siren_layer_jvp_orders_2_to_4():
    """SIREN kernel custom_jvp at orders 2-4 vs the jnp reference (KdV lives
    at order 3, Cahn-Hilliard at 4)."""
    from pinnrl_tpu.ops.kernels import siren_layer

    W = jax.random.normal(jax.random.PRNGKey(3), (2, 8)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(4), (8,)) * 0.1
    omega = 2.0
    v = jnp.array([0.0, 1.0])
    z0 = jnp.array([0.1, -0.2])

    def nest(f, k):
        for _ in range(k):
            f = (lambda g: (lambda z: jax.jvp(g, (z,), (v,))[1]))(f)
        return f

    u_k = lambda z: jnp.sum(siren_layer(z.reshape(1, 2), W, b, omega))
    u_ref = lambda z: jnp.sum(jnp.sin(omega * (z.reshape(1, 2) @ W + b)))

    for order in (2, 3, 4):
        a, r = float(nest(u_k, order)(z0)), float(nest(u_ref, order)(z0))
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-4)


def test_kernel_jvp_inside_pde_residual_orders():
    """End-to-end: the derivative engine's directional derivatives of a
    Fourier-feature composite match analytic derivatives at orders 1-4."""
    from pinnrl_tpu.ops.derivatives import directional_derivative

    B = jnp.array([[0.5], [0.0]])  # (2, 1): u depends only on x
    # u(z) = sin(2*pi*0.5*x) using the kernel; analytic derivatives known.
    u = lambda z: fourier_features(z.reshape(1, 2), B)[0, 0]
    z0 = jnp.array([0.3, 0.9])
    w = 2 * jnp.pi * 0.5
    x = float(z0[0])
    expect = [
        w * np.cos(w * x),
        -(w ** 2) * np.sin(w * x),
        -(w ** 3) * np.cos(w * x),
        (w ** 4) * np.sin(w * x),
    ]
    got = directional_derivative(u, z0, 0, 4)
    for k in range(4):
        np.testing.assert_allclose(float(got[k]), expect[k], rtol=1e-3, atol=1e-3)


def test_fused_step_supports_width_gate():
    """Auto mode attaches the fused fwd+bwd kernel only for >=128-wide
    trunks (measured 1.28x win at 256-wide, 0.73x LOSS at 64-wide —
    docs/performance.md round 4). CPU-runnable: supports() is pure logic
    except the backend check, which attach (not supports) performs."""
    import jax

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    def build(hidden, mapping):
        cfg = load_config(pde_type="burgers", architecture="fourier")
        cfg.model.hidden_dims = hidden
        cfg.model.arch_params["mapping_size"] = mapping
        return PINNModel(cfg, seed=0), create_pde(cfg), cfg

    m, p, c = build([256, 256, 256], 128)
    assert fused_step.supports(m, p, c.training)
    m, p, c = build([64, 64, 64], 32)
    assert not fused_step.supports(m, p, c.training)   # narrow: measured loss
    m, p, c = build([256, 256], 128)
    c.training.causal_eps = 1.0
    assert not fused_step.supports(m, p, c.training)   # causal weighting
