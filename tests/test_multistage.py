"""Multi-stage correction training (pinnrl_tpu/training/multistage.py).

New capability beyond the reference (single-net training only,
reference: pinnrl/training/trainer.py:391-963): u = u_base + eps * net_2,
trained on the same physics losses through the composed predictor.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer, StageSpec, correction_model, run_multistage
from pinnrl_tpu.training.multistage import _auto_eps, _stage_config
from tests.test_utils import tiny_config


def _trained_base(cfg):
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    res = trainer.train(seed=0)
    return pde, model, trainer._final_state["params"]["net"], res


def test_correction_model_eps_zero_is_identity():
    """With eps=0 the composed predictor equals the frozen base exactly."""
    cfg = tiny_config(architecture="fourier")
    pde, model, params, _ = _trained_base(cfg)
    m2 = correction_model(cfg, model.apply, params, eps=0.0, seed=7)
    z = jnp.linspace(0.0, 1.0, 10).reshape(5, 2)
    np.testing.assert_allclose(
        np.asarray(m2.apply(m2.params, z)), np.asarray(model.apply(params, z)),
        rtol=1e-6,
    )


def test_correction_model_composes_additively():
    """u_composed - u_base = eps * (u_composed(eps=1) - u_base)."""
    cfg = tiny_config(architecture="fourier")
    pde, model, params, _ = _trained_base(cfg)
    z = jax.random.uniform(jax.random.PRNGKey(3), (8, 2))
    base = model.apply(params, z)
    m_full = correction_model(cfg, model.apply, params, eps=1.0, seed=7)
    m_half = correction_model(cfg, model.apply, params, eps=0.5, seed=7)
    raw = m_full.apply(m_full.params, z) - base
    np.testing.assert_allclose(
        np.asarray(m_half.apply(m_half.params, z) - base),
        np.asarray(0.5 * raw),
        rtol=1e-5, atol=1e-7,
    )


def test_input_tangents_flow_through_frozen_base():
    """Residual derivatives of the composed net must include the base's
    input-derivatives (no stop_gradient severing the jvp path)."""
    cfg = tiny_config(architecture="fourier")
    pde, model, params, _ = _trained_base(cfg)
    m2 = correction_model(cfg, model.apply, params, eps=0.0, seed=7)
    z0 = jnp.array([0.4, 0.1])
    g_base = jax.jacfwd(lambda z: model.apply(params, z))(z0)
    g_comp = jax.jacfwd(lambda z: m2.apply(m2.params, z))(z0)
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_base), rtol=1e-5)
    assert float(jnp.abs(g_base).sum()) > 0.0


def test_run_multistage_end_to_end():
    cfg = tiny_config(architecture="fourier")
    res = run_multistage(cfg, [StageSpec(epochs=2)], seed=0)
    assert len(res.models) == 2
    assert len(res.stage_metrics) == 2
    assert len(res.eps_history) == 1
    assert res.eps_history[0] > 0.0
    for m in res.stage_metrics:
        assert np.isfinite(m["rel_l2"])
    # The composed predictor evaluates finitely on a fresh grid.
    z = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))
    out = res.apply_fn(res.params, z)
    assert np.all(np.isfinite(np.asarray(out)))


def test_stage_config_overrides():
    cfg = tiny_config(architecture="fourier")
    cfg.model.arch_params["scale"] = 1.0
    spec = StageSpec(epochs=5, learning_rate=1e-4, mapping_size=4)
    cfg2 = _stage_config(cfg, spec)
    assert cfg2.training.num_epochs == 5
    assert cfg2.training.optimizer_config.learning_rate == 1e-4
    assert cfg2.model.arch_params["mapping_size"] == 4
    # default scale_mult doubles the base Fourier scale
    assert cfg2.model.arch_params["scale"] == 2.0
    # original untouched
    assert cfg.training.num_epochs == 2
    assert cfg.model.arch_params["scale"] == 1.0


def test_auto_eps_uses_validation_error():
    cfg = tiny_config(architecture="fourier")
    pde, model, params, res = _trained_base(cfg)
    eps = _auto_eps(pde, model.apply, params, res["final_train_loss"])
    val = pde.validate(model.apply, params, num_points=4096)
    assert eps == np.sqrt(val["l2_error"])
