"""Deep-ensemble training (training.ensemble_size > 1) — new capability
beyond the reference: E independently-initialized members trained in one
vmapped fused scan, mean-predictor at apply time."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training.trainer import PDETrainer


def _tiny_cfg(**training_over):
    cfg = load_config(pde_type="heat", architecture="fourier")
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params["mapping_size"] = 8
    t = cfg.training
    t.num_epochs = 6
    t.num_collocation_points = 128
    t.batch_size = 64
    t.num_boundary_points = 32
    t.num_initial_points = 32
    t.validation_frequency = 3
    t.early_stopping.enabled = False
    t.adaptive_weights.enabled = False
    t.ensemble_size = 2
    for k, v in training_over.items():
        setattr(t, k, v)
    return cfg


def test_ensemble_size_validated():
    from pinnrl_tpu.config import TrainingConfig

    with pytest.raises(ValueError, match="ensemble_size"):
        TrainingConfig(ensemble_size=0)


@pytest.mark.parametrize(
    "over, msg",
    [
        (dict(optimizer="adam_lbfgs"), "optimizer"),
        (dict(collocation_distribution="adaptive"), "adaptive"),
        (dict(residual_dtype="float64"), "float32"),
    ],
)
def test_ensemble_constraints_raise(over, msg):
    cfg = _tiny_cfg(**over)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    with pytest.raises(ValueError, match=msg):
        trainer.train(seed=0)


def test_ensemble_trains_stacked_and_predicts_mean(tmp_path):
    cfg = _tiny_cfg()
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    res = trainer.train(seed=0, experiment_dir=str(tmp_path / "exp"))

    net = trainer._final_state["params"]["net"]
    leaves = jax.tree_util.tree_leaves(net)
    assert all(leaf.shape[0] == 2 for leaf in leaves)
    assert model.is_ensemble_params(net)

    # Members differ (independent inits + batches).
    m0 = jax.tree_util.tree_map(lambda a: a[0], net)
    m1 = jax.tree_util.tree_map(lambda a: a[1], net)
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(m0)[0]),
        np.asarray(jax.tree_util.tree_leaves(m1)[0]),
    )

    # apply == mean of member applies.
    x = jnp.linspace(0.0, 1.0, 7).reshape(-1, 1)
    z = jnp.concatenate([x, jnp.full_like(x, 0.3)], axis=-1)
    out = model.apply(net, z)
    mean = 0.5 * (model.apply(m0, z) + model.apply(m1, z))
    np.testing.assert_allclose(np.asarray(out), np.asarray(mean), rtol=2e-5, atol=1e-6)

    # History is the member-mean scalar stream; training ran.
    assert len(res["history"]["train_loss"]) == cfg.training.num_epochs
    assert np.isfinite(res["history"]["train_loss"]).all()

    # Experiment protocol still holds (metadata + final model written).
    assert (tmp_path / "exp" / "metadata.json").exists()
    assert (tmp_path / "exp" / "final_model.msgpack").exists()


def test_ensemble_save_load_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    trainer.train(seed=0)

    path = str(tmp_path / "ens.msgpack")
    model.save_state(path)

    fresh = PINNModel(cfg, seed=7)
    fresh.load_state(path)
    assert fresh.is_ensemble_params(fresh.params)
    z = jnp.array([[0.5, 0.2]])
    np.testing.assert_allclose(
        np.asarray(model.apply(model.params, z)),
        np.asarray(fresh.apply(fresh.params, z)),
        rtol=1e-6,
    )


def test_single_model_path_unchanged():
    cfg = _tiny_cfg(ensemble_size=1)
    model = PINNModel(cfg, seed=0)
    assert not model.is_ensemble_params(model.params)
    z = jnp.array([[0.5, 0.2]])
    assert model.apply(model.params, z).shape == (1, 1)
