"""Utils-layer coverage: io file protocol, plotting artifacts, logging,
module-level sampling helper (reference: tests/unit_tests/test_utils.py and
test_utils_coverage.py — 573 lines covering the same surface)."""

import json
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.utils import generate_collocation_points
from pinnrl_tpu.utils.io import (
    _to_serializable,
    load_model,
    save_live_snapshot,
    save_model,
    save_training_metrics,
)
from pinnrl_tpu.utils.logging import setup_logging
from pinnrl_tpu.utils.plotting import (
    create_interactive_report,
    plot_architecture_comparison,
    plot_collocation_evolution,
    plot_q_density,
    plot_solution,
    plot_training_history,
)


@pytest.fixture(scope="module")
def tiny_model_pde():
    cfg = load_config(pde_type="heat", architecture="feedforward")
    cfg.model.hidden_dims = [8, 8]
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    return cfg, pde, model


# --------------------------------------------------------------------- #
# io.py
# --------------------------------------------------------------------- #


def test_to_serializable_handles_arrays_and_scalars():
    obj = {
        "arr": np.arange(3),
        "jarr": jnp.ones((2,)),
        "np_f": np.float32(1.5),
        "np_i": np.int64(7),
        "nested": [np.zeros(2), {"x": np.float64(2.0)}],
        "plain": "s",
    }
    out = _to_serializable(obj)
    # Must be round-trippable through json with no default hook.
    s = json.dumps(out)
    back = json.loads(s)
    assert back["arr"] == [0, 1, 2]
    assert back["np_f"] == 1.5
    assert back["np_i"] == 7
    assert back["nested"][1]["x"] == 2.0


def test_save_training_metrics_protocol(tmp_path):
    history = {
        "train_loss": [3.0, 2.0, 1.0],
        "val_loss": [2.5, 1.5],
        "loss_components": {"residual": [1.0, 0.5], "boundary": []},
    }
    save_training_metrics(tmp_path, history)
    hist = json.loads((tmp_path / "history.json").read_text())
    assert hist["train_loss"] == [3.0, 2.0, 1.0]
    metrics = json.loads((tmp_path / "metrics.json").read_text())
    assert metrics["final_train_loss"] == 1.0
    assert metrics["final_val_loss"] == 1.5
    assert metrics["num_epochs_run"] == 3
    assert metrics["loss_components"]["residual"] == 0.5
    assert metrics["loss_components"]["boundary"] is None


def test_save_training_metrics_empty_history(tmp_path):
    save_training_metrics(tmp_path, {"train_loss": []})
    metrics = json.loads((tmp_path / "metrics.json").read_text())
    assert metrics["final_train_loss"] is None
    assert metrics["num_epochs_run"] == 0


def test_live_snapshot_1d(tmp_path, tiny_model_pde):
    cfg, pde, model = tiny_model_pde
    save_live_snapshot(tmp_path, pde, model, {"net": model.params}, grid=12)
    snap = np.load(tmp_path / "live_snapshot.npz")
    assert snap["u_pred"].shape == (12, 12)
    assert snap["residual"].shape == (12, 12)
    assert snap["dimension"] == 1
    assert np.isfinite(snap["u_pred"]).all()


def test_live_snapshot_2d(tmp_path):
    cfg = load_config(pde_type="heat_2d", architecture="feedforward")
    cfg.model.hidden_dims = [8, 8]
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    save_live_snapshot(tmp_path, pde, model, {"net": model.params}, grid=8)
    snap = np.load(tmp_path / "live_snapshot.npz")
    assert snap["u_pred"].shape == (8, 8)
    assert snap["dimension"] == 2


def test_live_snapshot_swallows_errors(tmp_path):
    # Monitoring must not kill training: a broken model is silently skipped.
    class Broken:
        def apply(self, *a, **k):
            raise RuntimeError("boom")

    cfg = load_config(pde_type="heat", architecture="feedforward")
    pde = create_pde(cfg)
    save_live_snapshot(tmp_path, pde, Broken(), {"net": {}})
    assert not (tmp_path / "live_snapshot.npz").exists()


def test_save_load_model_roundtrip(tmp_path, tiny_model_pde):
    cfg, pde, model = tiny_model_pde
    path = tmp_path / "model.msgpack"
    save_model(path, model, config={"arch": "feedforward", "dims": np.arange(2)})
    sidecar = json.loads(path.with_suffix(".config.json").read_text())
    assert sidecar["arch"] == "feedforward"
    assert sidecar["dims"] == [0, 1]

    fresh = PINNModel(cfg, seed=1)
    z = jnp.zeros((4, 2))
    before = fresh.apply(fresh.params, z)
    load_model(path, fresh)
    after = fresh.apply(fresh.params, z)
    expected = model.apply(model.params, z)
    np.testing.assert_allclose(np.asarray(after), np.asarray(expected), atol=1e-6)
    assert not np.allclose(np.asarray(before), np.asarray(after))


# --------------------------------------------------------------------- #
# plotting.py — every plotter returns a path to a real PNG/HTML file
# --------------------------------------------------------------------- #


def _history(n=5):
    return {
        "train_loss": list(np.linspace(3, 1, n)),
        "val_loss": list(np.linspace(2.5, 1.2, n)),
        "learning_rate": list(np.full(n, 1e-3)),
        "epoch_time": list(np.full(n, 0.1)),
        "loss_components": {
            k: list(np.linspace(1, 0.1, n))
            for k in ("residual", "boundary", "initial", "smoothness", "data")
        },
        "adaptive_weights": [[1.0, 1.0, 1.0, 0.0]] * n,
    }


def test_plot_training_history(tmp_path):
    out = plot_training_history(_history(), tmp_path / "hist.png")
    assert out is not None and out.exists() and out.stat().st_size > 0


def test_plot_solution_1d(tmp_path, tiny_model_pde):
    cfg, pde, model = tiny_model_pde
    out = plot_solution(pde, model, model.params, tmp_path / "sol.png")
    assert out is not None and out.exists() and out.stat().st_size > 0


def test_plot_collocation_evolution(tmp_path):
    pts = [np.random.default_rng(i).uniform(size=(32, 2)) for i in range(3)]
    out = plot_collocation_evolution(pts, ((0.0, 1.0),), (0.0, 1.0), tmp_path / "coll.png")
    assert out is not None and out.exists()


def test_plot_architecture_comparison(tmp_path):
    histories = {"feedforward": _history(), "fourier": _history(8)}
    out = plot_architecture_comparison(histories, tmp_path / "arch.png")
    assert out is not None and out.exists()


def test_plot_q_density(tmp_path):
    from pinnrl_tpu.rl import RLAgent

    agent = RLAgent(state_dim=2, hidden_dim=8, memory_size=64, batch_size=8)
    st = agent.init(jax.random.PRNGKey(0))
    out = plot_q_density(agent, st, ((0.0, 1.0),), (0.0, 1.0), tmp_path / "q.png", grid=16)
    assert out is not None and out.exists()


def test_interactive_report_is_selfcontained_html(tmp_path):
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "metadata.json").write_text(
        json.dumps({"experiment": "t", "pde": "heat", "status": "completed"})
    )
    (exp / "history.json").write_text(json.dumps(_history()))
    out = create_interactive_report(exp)
    assert out is not None and out.exists()
    html = out.read_text()
    assert "<html" in html.lower()
    assert "heat" in html
    # Self-contained: no external script/css fetches.
    assert "http://" not in html and "https://" not in html


# --------------------------------------------------------------------- #
# logging.py
# --------------------------------------------------------------------- #


def test_setup_logging_level_and_file(tmp_path):
    log_file = tmp_path / "run.log"
    logger = setup_logging(level="DEBUG", log_file=str(log_file))
    # basicConfig(force=True) configures the ROOT logger; the package logger
    # inherits its effective level.
    assert logger.getEffectiveLevel() == logging.DEBUG
    logger.debug("hello-debug")
    root = logging.getLogger()
    for h in root.handlers:
        h.flush()
    assert "hello-debug" in log_file.read_text()
    # Cleanup: drop the file handler so later tests don't write here.
    setup_logging(level="INFO")


def test_setup_logging_unknown_level_falls_back_to_info():
    logger = setup_logging(level="NOT_A_LEVEL")
    assert logger.getEffectiveLevel() == logging.INFO
    setup_logging(level="INFO")


# --------------------------------------------------------------------- #
# utils.__init__ sampling helper
# --------------------------------------------------------------------- #


def test_module_level_collocation_helper_bounds():
    x, t = generate_collocation_points(
        jax.random.PRNGKey(0), 256, ((-1.0, 2.0),), (0.0, 0.5), "uniform"
    )
    assert x.shape == (256, 1) and t.shape == (256, 1)
    assert float(x.min()) >= -1.0 and float(x.max()) <= 2.0
    assert float(t.min()) >= 0.0 and float(t.max()) <= 0.5
