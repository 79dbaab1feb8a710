"""Trainer smoke + protocol tests (analog of reference tests/unit_tests/
test_trainer.py, test_trainer_optimizers.py, test_heat_2d_training.py)."""

import json
from pathlib import Path

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
