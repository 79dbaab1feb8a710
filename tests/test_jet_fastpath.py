"""Stacked-jet residual fast path (ops/jet_mlp.py) vs the generic engine.

The fast path must be a pure program transformation: identical residuals and
identical parameter gradients (to f32 roundoff) for every bundle-compatible
PDE, across derivative orders 1-3, LayerNorm on/off, 1D and 2D, moving
frames, and trainable Fourier features.
"""

import jax
import jax.numpy as jnp
import pytest

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.ops.jet_mlp import BundleView
from pinnrl_tpu.pdes import create_pde


def _build(pde_name, **model_over):
    cfg = load_config(pde_type=pde_name, architecture="fourier")
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params["mapping_size"] = 8
    for k, v in model_over.items():
        if k in ("layer_norm", "activation"):
            setattr(cfg.model, k, v)
        else:
            cfg.model.arch_params[k] = v
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(1), 32)
    return pde, model, x, t


def _compare(pde, model, x, t, grad=True):
    r_slow = pde.compute_residual(model.apply, model.params, x, t)
    assert pde.attach_fast_bundle(model)
    r_fast = pde.compute_residual(model.apply, model.params, x, t)
    scale = float(jnp.max(jnp.abs(r_slow))) + 1e-12
    assert float(jnp.max(jnp.abs(r_fast - r_slow))) / scale < 1e-4

    if grad:
        def loss_of(p):
            return jnp.mean(pde.compute_residual(model.apply, p, x, t) ** 2)

        g_fast = jax.grad(loss_of)(model.params)
        pde._fast_bundle_fn = None
        g_slow = jax.grad(loss_of)(model.params)
        gl_f = jax.tree_util.tree_leaves(g_fast)
        gl_s = jax.tree_util.tree_leaves(g_slow)
        gscale = max(float(jnp.max(jnp.abs(a))) for a in gl_s) + 1e-12
        gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gl_f, gl_s))
        assert gerr / gscale < 1e-3


@pytest.mark.parametrize(
    "pde_name", ["burgers", "kdv", "wave", "heat_2d", "pendulum", "black_scholes"]
)
def test_fastpath_matches_generic(pde_name):
    """Residual AND parameter gradients agree with the per-point engine
    (orders: burgers 2, kdv 3, wave dt2, heat_2d two spatial axes,
    pendulum temporal-only, black_scholes z-dependent coefficients)."""
    pde, model, x, t = _build(pde_name)
    _compare(pde, model, x, t)


def test_fastpath_no_layernorm_and_gelu():
    pde, model, x, t = _build("burgers", layer_norm=False, activation="gelu")
    _compare(pde, model, x, t, grad=False)


def test_fastpath_moving_frame():
    """Co-moving frame makes d/dt pick up -c along every spatial axis; the
    closed-form embedding streams must apply the frame Jacobian."""
    pde, model, x, t = _build("burgers", moving_frame_speed=0.7)
    _compare(pde, model, x, t, grad=False)


def test_fastpath_trainable_features():
    """Trainable basis: B lives in params and must receive gradients."""
    pde, model, x, t = _build("burgers", trainable_features=True)
    _compare(pde, model, x, t)


def test_fastpath_feedforward_matches_generic():
    """The plain MLP trunk (no embedding) rides the same stacked transport."""
    cfg = load_config(pde_type="burgers", architecture="feedforward")
    cfg.model.hidden_dims = [16, 16]
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(1), 32)
    _compare(pde, model, x, t)


def test_fastpath_unsupported_falls_back():
    cfg = load_config(pde_type="heat", architecture="resnet")
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    assert not pde.attach_fast_bundle(model)  # auto -> graceful fallback
    with pytest.raises(ValueError):
        pde.attach_fast_bundle(model, enable=True)


def test_fastpath_cahn_hilliard_incompatible():
    """CH differentiates the composed chemical potential — must refuse."""
    cfg = load_config(pde_type="cahn_hilliard", architecture="fourier")
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    assert not pde.attach_fast_bundle(model)


def test_fastpath_disable():
    pde, model, x, t = _build("heat")
    assert not pde.attach_fast_bundle(model, enable=False)
    assert pde._fast_bundle_fn is None


def test_bundle_view_missing_order_raises():
    view = BundleView(jnp.zeros(()), {0: [jnp.zeros(())]})
    with pytest.raises(KeyError):
        view.directional(0, 2)
    with pytest.raises(KeyError):
        view.directional(1, 1)


def test_transport_block_matches_jet():
    """Hand-rolled LN+tanh Taylor transport (orders 1-3, shared statistics)
    vs jax.experimental.jet on the same block."""
    from jax.experimental import jet

    from pinnrl_tpu.ops.jet_mlp import _LN_EPS, _transport_block

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    h0 = jax.random.normal(ks[0], (16, 24))
    g1 = [jax.random.normal(ks[1], (16, 24)), jax.random.normal(ks[2], (16, 24)),
          jax.random.normal(ks[3], (16, 24))]
    g2 = [jax.random.normal(ks[4], (16, 24))]
    gamma = 1.0 + 0.1 * jax.random.normal(ks[5], (24,))
    beta = 0.1 * jax.random.normal(ks[6], (24,))

    for g_, b_ in ((gamma, beta), (None, None)):
        a0, outs = _transport_block(h0, [g1, g2], g_, b_, "tanh")

        def block(h):
            if g_ is not None:
                mu = jnp.mean(h, axis=-1, keepdims=True)
                var = jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu
                h = (h - mu) / jnp.sqrt(var + _LN_EPS) * g_ + b_
            return jnp.tanh(h)

        for streams, got in zip((g1, g2), outs):
            ref0, ref = jet.jet(block, (h0,), ([*streams],))
            assert jnp.allclose(a0, ref0, atol=1e-5)
            for a, b in zip(got, ref):
                assert jnp.allclose(a, b, atol=1e-4), (len(streams), g_ is None)


def test_stacked_jet_config_validation():
    cfg = load_config(pde_type="heat", architecture="fourier")
    assert cfg.training.get("stacked_jet", "auto") == "auto"
    import dataclasses

    with pytest.raises(ValueError):
        dataclasses.replace(cfg.training, stacked_jet="sometimes")
