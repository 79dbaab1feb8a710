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
    # Round 5: causal weighting is now SUPPORTED (exact prefix semantics
    # via the sequential-grid carry, measured on hardware).
    assert fused_step.supports(m, p, c.training)
    c.training.loss_function = "mae"
    assert not fused_step.supports(m, p, c.training)   # non-mse reduction


def test_fused_step_supports_order3():
    """Round 5: order-3 spatial jets (KdV class) pass the auto gate; the
    unmeasured order-4 class stays excluded."""
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="kdv", architecture="fourier")
    cfg.model.hidden_dims = [256, 256, 256]
    cfg.model.arch_params["mapping_size"] = 256
    m, p = PINNModel(cfg, seed=0), create_pde(cfg)
    assert max(p.spatial_orders) == 3
    assert fused_step.supports(m, p, cfg.training)


def test_fused_causal_residual_loss_interpret_matches_xla():
    """Causal fused kernel (round 5): exact parity with the XLA
    ``_residual_loss`` causal path — loss AND parameter gradients — in
    interpret mode (CPU-runnable; the on-TPU tier re-checks on hardware).
    The kernel's sequential-grid prefix carry must reproduce the global
    time-sorted exclusive cumsum across tiles."""
    import jax

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [32, 32]
    cfg.model.arch_params["mapping_size"] = 16
    cfg.training.causal_eps = 1.0
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)
    fused = fused_step.make_fused_residual_loss(
        model, pde, causal_eps=1.0, tile=32, interpret=True
    )

    x, t = pde.generate_collocation_points(jax.random.PRNGKey(7), 128)
    order = jnp.argsort(t.reshape(-1))
    z = jnp.concatenate([x, t], axis=-1)[order]

    def ref_loss(p):
        r = pde.compute_residual(model.apply, p, x, t, None)
        return pde._residual_loss(r, t)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(model.params)
    l_fus, g_fus = jax.value_and_grad(lambda p: fused(p, z))(model.params)
    assert abs(float(l_ref - l_fus)) / max(abs(float(l_ref)), 1e-12) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        denom = float(jnp.abs(a).max()) + 1e-12
        assert float(jnp.abs(a - b).max()) / denom < 1e-4


def test_fused_noncausal_interpret_matches_mean_mse():
    """The refactored non-causal path (sum-of-weights denominator) is still
    exactly mean(r^2)."""
    import jax

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [32, 32]
    cfg.model.arch_params["mapping_size"] = 16
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)
    fused = fused_step.make_fused_residual_loss(
        model, pde, tile=32, interpret=True
    )
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(3), 128)
    z = jnp.concatenate([x, t], axis=-1)
    r = pde.compute_residual(model.apply, model.params, x, t, None)
    ref = float(jnp.mean(r**2))
    got = float(fused(model.params, z))
    assert abs(ref - got) / max(abs(ref), 1e-12) < 1e-5


def test_fused_causal_order3_interpret():
    """KdV (order-3 jets) + causal weighting through the fused kernel in
    interpret mode: parity against the XLA path."""
    import jax

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="kdv", architecture="fourier")
    cfg.model.hidden_dims = [32, 32]
    cfg.model.arch_params["mapping_size"] = 16
    cfg.training.causal_eps = 0.5
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=1)
    pde.attach_fast_bundle(model)
    fused = fused_step.make_fused_residual_loss(
        model, pde, causal_eps=0.5, tile=16, interpret=True
    )
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(9), 64)
    order = jnp.argsort(t.reshape(-1))
    z = jnp.concatenate([x, t], axis=-1)[order]

    def ref_loss(p):
        r = pde.compute_residual(model.apply, p, x, t, None)
        return pde._residual_loss(r, t)

    l_ref = float(ref_loss(model.params))
    l_fus = float(fused(model.params, z))
    # Order-3 jets of a random-init net give r^2 ~ 1e7; tile-chunked f32
    # accumulation differs from XLA's single reduction at ~3e-5 relative.
    assert abs(l_ref - l_fus) / max(abs(l_ref), 1e-12) < 2e-4
