"""Dashboard server tests: API endpoints over the experiment file protocol."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from pinnrl_tpu.dashboard.server import (
    DashboardServer,
    get_experiments,
    launch_trainer,
    load_snapshot,
)


@pytest.fixture
def exp_dir(tmp_path):
    exp = tmp_path / "20260101_000000_heat_fourier_norl"
    exp.mkdir(parents=True)
    (exp / "metadata.json").write_text(json.dumps({
        "status": "completed", "pde_type": "heat", "architecture": "fourier",
        "mode": "forward", "rl_enabled": False, "num_epochs": 10,
        "current_epoch": 10, "trainable_parameters": [],
        "true_parameters": {}, "timestamp": "2026-01-01T00:00:00",
    }))
    (exp / "history.json").write_text(json.dumps({
        "train_loss": [1.0, 0.5], "val_loss": [0.9],
        "loss_components": {"residual": [0.5, 0.2]},
    }))
    (exp / "metrics.json").write_text(json.dumps({
        "final_train_loss": 0.5, "final_val_loss": 0.9,
    }))
    np.savez(exp / "live_snapshot.npz",
             u_pred=np.zeros((60, 60)), residual=np.ones((60, 60)),
             x=np.linspace(0, 1, 60), y_or_t=np.linspace(0, 1, 60),
             dimension=np.asarray(1))
    return tmp_path


@pytest.fixture
def server(exp_dir):
    srv = None
    for port in range(18050, 18070):
        try:
            srv = DashboardServer(results_dir=str(exp_dir), port=port)
            break
        except OSError:
            continue
    assert srv is not None
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://localhost:{srv.port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def test_index_html(server):
    status, body = _get(server + "/")
    assert status == 200
    assert b"pinnrl-tpu" in body
    assert b"Monitor" in body


def test_api_meta(server):
    status, body = _get(server + "/api/meta")
    meta = json.loads(body)
    assert "heat" in meta["pdes"]
    assert "fourier" in meta["architectures"]
    assert "active_matter" in meta["datasets"]


def test_api_experiments(server):
    _, body = _get(server + "/api/experiments")
    exps = json.loads(body)
    assert len(exps) == 1
    assert exps[0]["status"] == "completed"
    assert exps[0]["final_train_loss"] == 0.5


def test_api_history_and_snapshot(server):
    name = "20260101_000000_heat_fourier_norl"
    _, body = _get(f"{server}/api/experiment/{name}/history")
    assert json.loads(body)["train_loss"] == [1.0, 0.5]
    _, body = _get(f"{server}/api/experiment/{name}/snapshot")
    snap = json.loads(body)
    assert len(snap["u_pred"]) == 60
    assert snap["dimension"] == 1


def test_api_unknown_experiment(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/api/experiment/nonexistent/history")
    assert ei.value.code == 404


def test_stale_running_cleanup(exp_dir):
    exp = exp_dir / "20260101_000000_heat_fourier_norl"
    (exp / ".running").touch()  # completed metadata + marker -> stale
    exps = get_experiments(exp_dir)
    assert exps[0]["status"] == "completed"
    assert not (exp / ".running").exists()


def test_load_snapshot_missing(tmp_path):
    assert load_snapshot(tmp_path) is None


def test_launch_trainer_command(tmp_path, monkeypatch):
    captured = {}

    class FakeProc:
        pid = 4242

    def fake_popen(cmd, **kw):
        captured["cmd"] = cmd
        return FakeProc()

    monkeypatch.setattr("subprocess.Popen", fake_popen)
    info = launch_trainer(
        {"pde": "burgers", "arch": "resnet", "epochs": 5, "rl": True,
         "identify": ["nu"], "initial_guess": ["nu=0.1"]},
        tmp_path,
    )
    cmd = captured["cmd"]
    assert info["pid"] == 4242
    assert "--pde" in cmd and "burgers" in cmd
    assert "--rl" in cmd
    assert "--identify" in cmd and "nu" in cmd
    assert "--initial-guess" in cmd and "nu=0.1" in cmd


def test_solution_explorer_from_real_experiment(tmp_path):
    """Round-trip: a tiny completed training run is explorable through
    load_solution (exact-vs-predicted at a ladder of time slices), rebuilt
    from the saved config snapshot + final_model.msgpack — no shape
    inference (reference needs dashboard.py:2428-2501 for this)."""
    from pinnrl_tpu.dashboard.server import load_solution
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from pinnrl_tpu.training import PDETrainer
    from tests.test_utils import tiny_config

    cfg = tiny_config(pde_type="heat", architecture="feedforward")
    pde = create_pde(cfg)
    model = PINNModel(cfg)
    exp = tmp_path / "exp1"
    PDETrainer(model, pde, cfg).train(experiment_dir=str(exp))

    payload = load_solution(exp, grid=16, n_times=3)
    assert payload is not None
    assert payload["dimension"] == 1
    assert len(payload["times"]) == 3
    assert len(payload["u_pred"]) == 3
    assert len(payload["u_pred"][0]) == 16
    assert payload["u_exact"] is not None  # heat has an exact solution
    assert np.isfinite(np.asarray(payload["u_pred"])).all()
    # Cached on second call (same object).
    assert load_solution(exp, grid=16, n_times=3) is payload


def test_solution_explorer_missing_artifacts(tmp_path):
    from pinnrl_tpu.dashboard.server import load_solution

    empty = tmp_path / "no_exp"
    empty.mkdir()
    assert load_solution(empty) is None


def test_report_endpoint_serves_html(server):
    """/api/experiment/<name>/report generates (if absent) and serves the
    self-contained HTML report (reference: dashboard.py:2091-2127)."""
    status, body = _get(
        server + "/api/experiment/20260101_000000_heat_fourier_norl/report"
    )
    assert status == 200
    assert b"<html" in body.lower() or b"<!doctype" in body.lower()


def test_spa_has_report_link_and_true_param_line(server):
    """Round-5 SPA parity odds-and-ends: the Monitor tab links the report
    download and draws dashed true-value lines on inverse trajectories."""
    _, body = _get(server + "/")
    assert b"report-link" in body
    assert b"/report" in body
    assert b"true_parameters" in body
    assert b"stroke-dasharray" in body
