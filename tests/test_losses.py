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


def test_gpinn_loss_term():
    """loss_weights.gpinn > 0 adds the gradient-enhanced residual penalty
    (gPINN, Yu et al. 2022) via order-(k+1) forward jets; weight 0 keeps the
    total unchanged and the component zero."""
    import jax
    import jax.numpy as jnp

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde

    def losses_with(gpinn_w):
        cfg = load_config(pde_type="kdv", architecture="fourier")
        cfg.model.hidden_dims = [16, 16]
        cfg.model.arch_params["mapping_size"] = 8
        cfg.training.loss_weights["gpinn"] = gpinn_w
        pde = create_pde(cfg)
        model = PINNModel(cfg, seed=0)
        k = jax.random.PRNGKey(0)
        x, t = pde.generate_collocation_points(k, 32, "uniform")
        return pde.compute_loss(model.apply, model.params, x, t, key=k), model, pde, x, t, k

    off, *_ = losses_with(0.0)
    assert float(off["gpinn"]) == 0.0
    on, model, pde, x, t, k = losses_with(1e-4)
    assert float(on["gpinn"]) > 0 and jnp.isfinite(on["gpinn"])
    # total includes the weighted term (other components identical)
    assert float(on["total"]) > float(off["total"])
    # gradients flow through the order-4 nested jets
    g = jax.grad(
        lambda p: pde.compute_loss(model.apply, p, x, t, key=k)["total"]
    )(model.params)
    n = sum(float(jnp.sum(l**2)) for l in jax.tree_util.tree_leaves(g))
    assert jnp.isfinite(n) and n > 0
