"""Trainer smoke + protocol tests (analog of reference tests/unit_tests/
test_trainer.py, test_trainer_optimizers.py, test_heat_2d_training.py)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.rl import RLAgent
from pinnrl_tpu.training import PDETrainer
from tests.test_utils import tiny_config


def make_trainer(cfg, rl=False):
    pde = create_pde(cfg)
    model = PINNModel(cfg)
    agent = (
        RLAgent(state_dim=cfg.model.input_dim, hidden_dim=16, memory_size=256, batch_size=16)
        if rl
        else None
    )
    return PDETrainer(model, pde, cfg, rl_agent=agent)


def test_smoke_train_finite():
    trainer = make_trainer(tiny_config())
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])
    assert len(trainer.history["train_loss"]) == 2


def test_experiment_dir_protocol(tmp_path):
    trainer = make_trainer(tiny_config())
    res = trainer.train(experiment_dir=str(tmp_path / "exp"))
    exp = tmp_path / "exp"
    for fname in ["metadata.json", "history.json", "metrics.json",
                  "live_snapshot.npz", "final_model.msgpack"]:
        assert (exp / fname).exists(), fname
    assert not (exp / ".running").exists()  # marker removed at completion
    meta = json.loads((exp / "metadata.json").read_text())
    assert meta["status"] == "completed"
    assert meta["pde_type"] == "heat"
    hist = json.loads((exp / "history.json").read_text())
    assert len(hist["train_loss"]) == 2
    assert "residual" in hist["loss_components"]
    snap = np.load(exp / "live_snapshot.npz")
    assert snap["u_pred"].shape == (60, 60)
    assert snap["residual"].shape == (60, 60)
    assert res["status"] == "completed"


def test_metadata_serializes_string_parameters(tmp_path):
    # Regression: parameters like cahn_hilliard's formulation="mixed" are
    # strings; metadata writing must not force-float them.
    cfg = tiny_config()
    trainer = make_trainer(cfg)
    trainer.pde.parameters["formulation"] = "mixed"
    trainer.pde.parameters["flag"] = True
    res = trainer.train(experiment_dir=str(tmp_path / "exp"))
    assert res["status"] == "completed"
    meta = json.loads((tmp_path / "exp" / "metadata.json").read_text())
    assert meta["parameters"]["formulation"] == "mixed"
    assert meta["parameters"]["flag"] is True
    assert isinstance(meta["parameters"]["alpha"], float)


@pytest.mark.parametrize("optimizer", ["adam", "lbfgs", "adam_lbfgs"])
def test_optimizers(optimizer):
    cfg = tiny_config(optimizer=optimizer, num_epochs=4)
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])


def test_adam_lbfgs_switches_phase():
    cfg = tiny_config(optimizer="adam_lbfgs", num_epochs=4, adam_lbfgs_switch_ratio=0.5)
    trainer = make_trainer(cfg)
    assert trainer.switch_epoch == 2
    res = trainer.train()
    assert res["status"] == "completed"


@pytest.mark.parametrize("strategy", ["uniform", "stratified", "residual_based"])
def test_sampling_strategies(strategy):
    cfg = tiny_config(collocation_distribution=strategy)
    res = make_trainer(cfg).train()
    assert res["status"] == "completed"


def test_rl_agent_training():
    trainer = make_trainer(tiny_config(num_epochs=3), rl=True)
    assert trainer.strategy == "adaptive"
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])


@pytest.mark.parametrize("aw_strategy", ["rbw", "lrw"])
def test_adaptive_weights_integration(aw_strategy):
    cfg = tiny_config()
    cfg.training.adaptive_weights.enabled = True
    cfg.training.adaptive_weights.strategy = aw_strategy
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    w = trainer.history["adaptive_weights"][-1]
    assert len(w) == 4  # padded to 4 like the reference (trainer.py:674-684)


@pytest.mark.parametrize("loss_function", ["mse", "mae", "huber"])
def test_loss_functions(loss_function):
    cfg = tiny_config(loss_function=loss_function)
    res = make_trainer(cfg).train()
    assert res["status"] == "completed"


def test_heat_2d_smoke():
    """2D heat: loss finite and bounded (reference: test_heat_2d_training.py:113-124)."""
    cfg = tiny_config(pde_type="heat_2d", num_epochs=3)
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    first, last = trainer.history["train_loss"][0], trainer.history["train_loss"][-1]
    assert np.isfinite(last) and last <= 50 * max(first, 1e-8)


def test_early_stopping_triggers():
    cfg = tiny_config(num_epochs=30, validation_frequency=1)
    cfg.training.early_stopping.enabled = True
    cfg.training.early_stopping.patience = 2
    cfg.training.early_stopping.min_delta = 1e10  # nothing counts as improvement
    trainer = make_trainer(cfg)
    trainer.train()
    assert len(trainer.history["train_loss"]) < 30


def test_scheduler_reduces_lr():
    cfg = tiny_config(num_epochs=4, scheduler_type="cosine")
    trainer = make_trainer(cfg)
    trainer.train()
    lrs = trainer.history["learning_rate"]
    assert lrs[-1] < lrs[0]


def test_plateau_scheduler_runs():
    cfg = tiny_config(num_epochs=3, scheduler_type="reduce_lr")
    res = make_trainer(cfg).train()
    assert res["status"] == "completed"


def test_rar_end_to_end_concentrates_and_trains():
    """Trainer + RAR end-to-end (analog of reference
    test_rar_sampling.py:74-148): residual_based strategy runs the full
    trainer, stays finite, and records sampled points."""
    cfg = tiny_config(collocation_distribution="residual_based", num_epochs=3)
    trainer = make_trainer(cfg)
    assert trainer.strategy == "residual_based"
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])
    assert len(trainer.points_history) >= 1
    pts = trainer.points_history[-1]
    assert pts.shape[1] == 2 and np.isfinite(pts).all()


def test_rl_epsilon_decays_per_epoch():
    """With the per-epoch schedule, epsilon after N epochs is
    start * decay^N (not collapsed to epsilon_min by per-step decay)."""
    cfg = tiny_config(num_epochs=4)
    trainer = make_trainer(cfg, rl=True)
    trainer.rl_agent.epsilon_decay = 0.9
    res = trainer.train()
    assert res["status"] == "completed"
    eps = float(trainer._final_state["rl"].epsilon)
    np.testing.assert_allclose(eps, 1.0 * 0.9**4, rtol=1e-5)


def test_file_handler_released(tmp_path):
    """train() must detach its per-experiment FileHandler (round-1 leak)."""
    import logging

    from pinnrl_tpu.training import trainer as trainer_mod

    before = list(trainer_mod.logger.handlers)
    t = make_trainer(tiny_config())
    t.train(experiment_dir=str(tmp_path / "exp"))
    assert trainer_mod.logger.handlers == before


def test_f64_lbfgs_polish_runs():
    """residual_dtype=float64 switches the L-BFGS phase to f64 and returns
    f32 model params."""
    import jax.numpy as jnp

    cfg = tiny_config(
        optimizer="adam_lbfgs", num_epochs=4, residual_dtype="float64"
    )
    cfg.training.adam_lbfgs_switch_ratio = 0.5
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])
    # Final state keeps f64 precision; the public model contract is f32.
    leaves = jax.tree_util.tree_leaves(trainer._final_state["params"]["net"])
    assert any(leaf.dtype == jnp.float64 for leaf in leaves)
    model_leaves = jax.tree_util.tree_leaves(trainer.model.params)
    assert all(leaf.dtype == jnp.float32 for leaf in model_leaves)


def test_lbfgs_batch_size_cap():
    """training.lbfgs.batch_size caps the fixed L-BFGS-phase batch (the
    f64 polish OOMs at full batch on a 16G chip without it)."""
    cfg = tiny_config(optimizer="adam_lbfgs", num_epochs=4)
    cfg.training.adam_lbfgs_switch_ratio = 0.5
    cfg.training.lbfgs.batch_size = 16  # < num_collocation_points (64)
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])


def test_lbfgs_batch_size_caps_pure_lbfgs():
    cfg = tiny_config(optimizer="lbfgs", num_epochs=2)
    cfg.training.lbfgs.batch_size = 16
    res = make_trainer(cfg).train()
    assert res["status"] == "completed"


def test_lbfgs_resample_rounds_change_batch():
    """lbfgs.resample_every refreshes the fixed batch and restarts the
    optimizer: the polish must not overfit one frozen point set. The loss
    jump at a round boundary (new batch) is the observable."""
    cfg = tiny_config(optimizer="adam_lbfgs", num_epochs=8)
    cfg.training.adam_lbfgs_switch_ratio = 0.25  # 2 adam + 6 lbfgs epochs
    cfg.training.lbfgs.batch_size = 16
    cfg.training.lbfgs.resample_every = 2  # 3 rounds
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])
    assert len(trainer.history["train_loss"]) == 8


def test_lbfgs_resample_validation():
    import pytest

    from pinnrl_tpu.config import Config, load_config

    raw = load_config().raw
    raw["training"]["lbfgs"] = {"resample_every": 0}
    with pytest.raises(ValueError, match="resample_every"):
        Config(config_dict=raw)


def test_phase2_adam_f64_finetune():
    """phase2_optimizer=adam: after the switch the trainer fine-tunes with
    fresh per-step batches in f64 (the generalizing noise-floor escape)."""
    cfg = tiny_config(optimizer="adam_lbfgs", num_epochs=6)
    cfg.training.adam_lbfgs_switch_ratio = 0.5
    cfg.training.phase2_optimizer = "adam"
    cfg.training.phase2_learning_rate = 1e-4
    cfg.training.residual_dtype = "float64"
    cfg.training.lbfgs.batch_size = 16
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])
    assert len(trainer.history["train_loss"]) == 6
    leaves = jax.tree_util.tree_leaves(trainer._final_state["params"]["net"])
    import jax.numpy as jnp
    assert any(leaf.dtype == jnp.float64 for leaf in leaves)


def test_phase2_optimizer_validation():
    import pytest

    from pinnrl_tpu.config import Config, load_config

    raw = load_config().raw
    raw["training"]["phase2_optimizer"] = "sgd"
    with pytest.raises(ValueError, match="phase2_optimizer"):
        Config(config_dict=raw)


def test_param_ema_validation():
    from pinnrl_tpu.config import TrainingConfig

    with pytest.raises(ValueError, match="param_ema"):
        TrainingConfig(param_ema=1.5)


def test_param_ema_debiased_limits():
    """Zero-init + bias-corrected EMA: at decay -> 0 the averaged iterate
    equals the raw last iterate (same seed, same trajectory); at moderate
    decay it differs (it is a trailing average), and stays finite."""
    import jax.numpy as jnp
    import numpy as np

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from pinnrl_tpu.training.trainer import PDETrainer

    def run(ema):
        cfg = load_config(pde_type="heat", architecture="feedforward")
        cfg.model.hidden_dims = [16, 16]
        t = cfg.training
        t.num_epochs = 4
        t.num_collocation_points = 64
        t.batch_size = 64
        t.num_boundary_points = 16
        t.num_initial_points = 16
        t.validation_frequency = 2
        t.early_stopping.enabled = False
        t.adaptive_weights.enabled = False
        t.param_ema = ema
        model = PINNModel(cfg, seed=0)
        pde = create_pde(cfg)
        PDETrainer(model, pde, cfg).train(seed=0)
        return np.asarray(jax.tree_util.tree_leaves(model.params)[0])

    raw = run(0.0)
    near_zero = run(1e-6)  # EMA with d ~ 0 IS the last iterate (debiased)
    np.testing.assert_allclose(near_zero, raw, rtol=1e-4, atol=1e-6)
    mid = run(0.5)
    assert np.isfinite(mid).all()
    assert not np.allclose(mid, raw)  # trailing average != last iterate


def test_param_ema_with_lbfgs_phase():
    """adam_lbfgs + EMA: the polish starts from the EMA iterate and the run
    completes finite."""
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from pinnrl_tpu.training.trainer import PDETrainer

    cfg = load_config(pde_type="heat", architecture="feedforward")
    cfg.model.hidden_dims = [16, 16]
    t = cfg.training
    t.num_epochs = 6
    t.num_collocation_points = 64
    t.batch_size = 64
    t.num_boundary_points = 16
    t.num_initial_points = 16
    t.validation_frequency = 2
    t.early_stopping.enabled = False
    t.adaptive_weights.enabled = False
    t.optimizer = "adam_lbfgs"
    t.adam_lbfgs_switch_ratio = 0.5
    t.param_ema = 0.99
    model = PINNModel(cfg, seed=0)
    pde = create_pde(cfg)
    res = PDETrainer(model, pde, cfg).train(seed=0)
    assert np.isfinite(res["history"]["train_loss"]).all()


def test_param_ema_with_ensemble():
    """EMA composes with the vmapped deep ensemble (stacked shadow)."""
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from pinnrl_tpu.training.trainer import PDETrainer

    cfg = load_config(pde_type="heat", architecture="feedforward")
    cfg.model.hidden_dims = [16, 16]
    t = cfg.training
    t.num_epochs = 4
    t.num_collocation_points = 64
    t.batch_size = 64
    t.num_boundary_points = 16
    t.num_initial_points = 16
    t.validation_frequency = 2
    t.early_stopping.enabled = False
    t.adaptive_weights.enabled = False
    t.ensemble_size = 2
    t.param_ema = 0.99
    model = PINNModel(cfg, seed=0)
    pde = create_pde(cfg)
    trainer = PDETrainer(model, pde, cfg)
    res = trainer.train(seed=0)
    assert np.isfinite(res["history"]["train_loss"]).all()
    assert model.is_ensemble_params(trainer._final_state["params"]["net"])


def test_profiler_trace_hook(tmp_path):
    """training.profile_dir captures one jax.profiler trace of the second
    epoch chunk (new capability; SURVEY §5.1 notes the reference has none)."""
    cfg = tiny_config(num_epochs=3, validation_frequency=1)
    cfg.training.profile_dir = str(tmp_path / "trace")
    trainer = make_trainer(cfg)
    res = trainer.train()
    assert res["status"] == "completed"
    produced = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in produced), "no profiler artifacts written"
