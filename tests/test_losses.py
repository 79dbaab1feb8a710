"""Loss reduction semantics (analog of reference tests/unit_tests/test_loss_functions.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.ops.losses import apply_loss_fn, relative_l2


@pytest.fixture
def diff():
    return jnp.array([-2.0, -0.5, 0.0, 0.5, 3.0])


def test_mse(diff):
    np.testing.assert_allclose(
        apply_loss_fn(diff, "mse"), np.mean(np.asarray(diff) ** 2), rtol=1e-6
    )


def test_mae(diff):
    np.testing.assert_allclose(
        apply_loss_fn(diff, "mae"), np.mean(np.abs(np.asarray(diff))), rtol=1e-6
    )


def test_huber(diff):
    d = np.asarray(diff)
    delta = 1.0
    expected = np.where(np.abs(d) <= delta, 0.5 * d**2, delta * (np.abs(d) - 0.5 * delta))
    np.testing.assert_allclose(apply_loss_fn(diff, "huber", delta), expected.mean(), rtol=1e-6)


def test_huber_delta_sensitivity(diff):
    assert float(apply_loss_fn(diff, "huber", 0.1)) < float(apply_loss_fn(diff, "huber", 10.0))


def test_unknown_raises(diff):
    with pytest.raises(ValueError):
        apply_loss_fn(diff, "l1")


def test_relative_l2():
    a = jnp.array([1.0, 2.0])
    np.testing.assert_allclose(relative_l2(a, a), 0.0, atol=1e-6)
    np.testing.assert_allclose(relative_l2(2 * a, a), 1.0, rtol=1e-5)
