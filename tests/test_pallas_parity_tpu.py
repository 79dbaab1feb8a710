"""On-TPU Pallas kernel-vs-XLA parity (VERDICT r3 next-step 5).

The CPU suite only exercises the XLA fallbacks (`use_pallas` gates on the
backend), so kernel-vs-fallback agreement was asserted nowhere. This file
runs ONLY on a real TPU backend (skipped on CPU) and checks every Pallas
kernel against the plain-jnp formula it replaces — including the nested
forward-mode orders the residual engine drives through the custom-jvp rules.

Run on the bench chip:  python -m pytest tests/test_pallas_parity_tpu.py -q
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas kernel parity needs the TPU backend (CPU runs the fallback)",
)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)


# --------------------------------------------------------------------- #
# fourier_features
# --------------------------------------------------------------------- #

def _ff_ref(x, B, two_pi=True):
    proj = x @ B
    if two_pi:
        proj = 2.0 * jnp.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


@pytest.fixture(scope="module")
def ff_inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (512, 2), jnp.float32)
    B = jax.random.normal(k2, (2, 128), jnp.float32)
    return x, B


def test_fourier_features_primal(ff_inputs):
    from pinnrl_tpu.ops.kernels.fourier_feats import fourier_features

    x, B = ff_inputs
    assert _rel(fourier_features(x, B), _ff_ref(x, B)) < 1e-5


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_fourier_features_nested_jvp(ff_inputs, order):
    """The derivative engine nests jvp up to 4 deep (Cahn-Hilliard) through
    the kernel's custom-jvp rule; each order must match the jnp formula."""
    from pinnrl_tpu.ops.kernels.fourier_feats import fourier_features

    x, B = ff_inputs
    v = jnp.zeros_like(x).at[:, 0].set(1.0)

    def nest(f, depth):
        if depth == 0:
            return f
        return nest(lambda xx: jax.jvp(f, (xx,), (v,))[1], depth - 1)

    got = nest(lambda xx: fourier_features(xx, B), order)(x)
    want = nest(lambda xx: _ff_ref(xx, B), order)(x)
    assert _rel(got, want) < 1e-4 * (10 ** (order - 1))


# --------------------------------------------------------------------- #
# siren_layer
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def siren_inputs():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.uniform(k1, (512, 64), jnp.float32)
    W = jax.random.normal(k2, (64, 128), jnp.float32) * 0.1
    b = jax.random.normal(k3, (128,), jnp.float32) * 0.1
    return x, W, b


def test_siren_layer_primal(siren_inputs):
    from pinnrl_tpu.ops.kernels.siren import siren_layer

    x, W, b = siren_inputs
    want = jnp.sin(30.0 * (x @ W + b))
    assert _rel(siren_layer(x, W, b, 30.0), want) < 1e-5


def test_siren_layer_jvp(siren_inputs):
    from pinnrl_tpu.ops.kernels.siren import siren_layer

    x, W, b = siren_inputs
    v = jnp.ones_like(x)
    _, got = jax.jvp(lambda xx: siren_layer(xx, W, b, 30.0), (x,), (v,))
    _, want = jax.jvp(lambda xx: jnp.sin(30.0 * (xx @ W + b)), (x,), (v,))
    assert _rel(got, want) < 1e-4


# --------------------------------------------------------------------- #
# fused_mlp_score (DQN grid scorer)
# --------------------------------------------------------------------- #

def test_fused_mlp_score_matches_flax():
    from pinnrl_tpu.ops.kernels.mlp import fused_mlp_score
    from pinnrl_tpu.rl.dqn import DQNNetwork

    net = DQNNetwork(hidden_dim=128, action_dim=4)
    x = jax.random.uniform(jax.random.PRNGKey(2), (512, 2), jnp.float32)
    params = net.init(jax.random.PRNGKey(3), x[:1])["params"]
    got = fused_mlp_score(x, params)
    want = net.apply({"params": params}, x)
    assert _rel(got, want) < 1e-4


# --------------------------------------------------------------------- #
# fused forward+backward residual-loss kernel
# --------------------------------------------------------------------- #

def test_fused_residual_loss_matches_xla_path():
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params["mapping_size"] = 32
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)
    # Built directly: auto mode's width gate excludes this 64-wide config
    # for PERF reasons (0.73x, docs/performance.md) — numerics are width-
    # independent, and this shape's Mosaic compile is already cached.
    fused = fused_step.make_fused_residual_loss(model, pde)

    x, t = pde.generate_collocation_points(jax.random.PRNGKey(4), 1024)
    z = jnp.concatenate([x, t], axis=-1)

    def ref_loss(p):
        r = pde.compute_residual(model.apply, p, x, t, None)
        return jnp.mean(r**2)

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(model.params)
    l_fus, g_fus = jax.jit(jax.value_and_grad(lambda p: fused(p, z)))(model.params)
    assert abs(float(l_ref - l_fus)) / float(l_ref) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        assert _rel(a, b) < 1e-4


def test_fused_causal_residual_loss_matches_xla_on_tpu():
    """Round 5: the causal fused kernel's sequential-grid prefix carry on
    REAL Mosaic — loss + grads vs the XLA ``_residual_loss`` causal path."""
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params["mapping_size"] = 32
    cfg.training.causal_eps = 1.0
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)
    fused = fused_step.make_fused_residual_loss(
        model, pde, causal_eps=1.0, tile=128
    )
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(4), 1024)
    order = jnp.argsort(t.reshape(-1))
    z = jnp.concatenate([x, t], axis=-1)[order]

    def ref_loss(p):
        r = pde.compute_residual(model.apply, p, x, t, None)
        return pde._residual_loss(r, t)

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(model.params)
    l_fus, g_fus = jax.jit(jax.value_and_grad(lambda p: fused(p, z)))(model.params)
    assert abs(float(l_ref - l_fus)) / abs(float(l_ref)) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        assert _rel(a, b) < 1e-3


def test_fused_order3_kdv_loss_matches_xla_on_tpu():
    """Order-3 jets (KdV) through the fused kernel on real Mosaic."""
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.kernels import fused_step
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="kdv", architecture="fourier")
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params["mapping_size"] = 32
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=1)
    pde.attach_fast_bundle(model)
    fused = fused_step.make_fused_residual_loss(model, pde, tile=64)
    x, t = pde.generate_collocation_points(jax.random.PRNGKey(5), 512)
    z = jnp.concatenate([x, t], axis=-1)

    def ref_loss(p):
        r = pde.compute_residual(model.apply, p, x, t, None)
        return jnp.mean(r**2)

    l_ref = float(jax.jit(ref_loss)(model.params))
    l_fus = float(jax.jit(lambda p: fused(p, z))(model.params))
    assert abs(l_ref - l_fus) / max(abs(l_ref), 1e-12) < 2e-4


def test_grid_fno_dft_spectral_conv_on_tpu():
    """The truncated-DFT spectral conv trains on this backend (the FFT
    path's gradient does not lower — the measured round-5 motivation)."""
    from pinnrl_tpu.models.fno_grid import GridFNO2D

    fno = GridFNO2D(width=8, modes=4, num_blocks=2)
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 24, 1))
    p = fno.init(jax.random.PRNGKey(1), a)
    loss, g = jax.value_and_grad(
        lambda p: jnp.mean(fno.apply(p, a) ** 2)
    )(p)
    assert np.isfinite(float(loss))
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )
