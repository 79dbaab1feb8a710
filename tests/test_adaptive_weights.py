"""Adaptive loss weighting tests (analog of reference adaptive-weight coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.training.adaptive_weights import AdaptiveLossWeights


def test_first_update_returns_initial_weights():
    aw = AdaptiveLossWeights(strategy="rbw", initial_weights=[0.2, 0.5, 0.3])
    st = aw.init()
    st = aw.update(st, jnp.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(st.weights), [0.2, 0.5, 0.3], rtol=1e-6)


def test_rbw_higher_loss_gets_higher_weight():
    aw = AdaptiveLossWeights(strategy="rbw", alpha=0.5)
    st = aw.init()
    for _ in range(10):
        st = aw.update(st, jnp.array([10.0, 1.0, 0.1]))
    w = np.asarray(st.weights)
    assert w[0] > w[1] > w[2]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-3)


def test_lrw_inverse_to_grad_norms():
    aw = AdaptiveLossWeights(strategy="lrw", alpha=0.5)
    st = aw.init()
    for _ in range(10):
        st = aw.update(st, jnp.array([10.0, 1.0, 0.1]))
    w = np.asarray(st.weights)
    assert w[0] < w[1] < w[2]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


def test_invalid_strategy():
    with pytest.raises(ValueError):
        AdaptiveLossWeights(strategy="bogus")


def test_ema_smoothing():
    aw = AdaptiveLossWeights(strategy="rbw", alpha=0.99)
    st = aw.init()
    st = aw.update(st, jnp.array([1.0, 1.0, 1.0]))
    w1 = np.asarray(st.weights)
    st = aw.update(st, jnp.array([100.0, 0.01, 0.01]))
    w2 = np.asarray(st.weights)
    # With alpha=0.99 a single spike barely moves the weights.
    assert abs(w2[0] - w1[0]) < 0.05
