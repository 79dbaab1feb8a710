"""Final plots, HTML report, and checkpoint/resume tests."""

import json
from pathlib import Path

import numpy as np
import pytest

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer
from tests.test_utils import tiny_config


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exp")
    cfg = tiny_config(num_epochs=3, validation_frequency=1)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    trainer.train(experiment_dir=str(tmp / "run"))
    return tmp / "run", trainer


def test_final_plots_written(trained_exp):
    exp, _ = trained_exp
    viz = exp / "visualizations"
    assert (viz / "training_history.png").exists()
    assert (viz / "solution.png").exists()
    assert (viz / "collocation_evolution.png").exists()
    assert (exp / "report.html").exists()
    assert (exp / "fdm_comparison.json").exists()
    cmp = json.loads((exp / "fdm_comparison.json").read_text())
    assert np.isfinite(cmp["fdm_vs_pinn_l2"])


def test_report_is_self_contained(trained_exp):
    exp, _ = trained_exp
    html = (exp / "report.html").read_text()
    assert "<svg" in html
    assert "http://" not in html.replace("http://localhost", "")  # no CDNs


def test_checkpoint_exists_and_resume(trained_exp, tmp_path):
    exp, trainer = trained_exp
    ckpt = exp / "checkpoint.msgpack"
    assert ckpt.exists()

    # Resume into a fresh trainer: continues from saved epoch, same history.
    cfg = tiny_config(num_epochs=5, validation_frequency=1)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    t2 = PDETrainer(model, pde, cfg)
    res = t2.train(experiment_dir=str(tmp_path / "resumed"), resume_from=str(ckpt))
    assert res["status"] == "completed"
    # 3 epochs from the checkpointed history + 2 new ones.
    assert len(t2.history["train_loss"]) == 5


def test_architecture_comparison_plot(tmp_path):
    from pinnrl_tpu.utils.plotting import plot_architecture_comparison

    out = plot_architecture_comparison(
        {"a": {"train_loss": [1.0, 0.5]}, "b": {"train_loss": [2.0, 1.0]}},
        tmp_path / "cmp.png",
    )
    assert out is not None and out.exists()
