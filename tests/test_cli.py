"""CLI tests: pinnrl-train and pinnrl-benchmark end-to-end in-process."""

import json
from pathlib import Path

import numpy as np
import pytest

from pinnrl_tpu.benchmarks import cli as bench_cli
from pinnrl_tpu.training import train as train_cli


def _tiny_args(tmp_path, *extra):
    return [
        "--pde", "heat", "--arch", "feedforward",
        "--epochs", "2", "--batch-size", "32", "--collocation-points", "64",
        "--boundary-points", "32", "--initial-points", "32",
        "--results-dir", str(tmp_path),
        *extra,
    ]


def test_train_cli_end_to_end(tmp_path):
    rc = train_cli.main(_tiny_args(tmp_path))
    assert rc == 0
    exps = list(Path(tmp_path).iterdir())
    assert len(exps) == 1
    exp = exps[0]
    assert "_heat_feedforward_norl" in exp.name
    for f in ["config.yaml", "metadata.json", "history.json", "metrics.json"]:
        assert (exp / f).exists(), f
    meta = json.loads((exp / "metadata.json").read_text())
    assert meta["status"] == "completed"


def test_train_cli_display_name_resolution():
    assert train_cli.resolve_pde_key("Heat Equation") == "heat"
    assert train_cli.resolve_pde_key("allen_cahn") == "allen_cahn"
    assert train_cli.resolve_pde_key("KdV Equation") == "kdv"
    with pytest.raises(ValueError):
        train_cli.resolve_pde_key("navier stokes")


def test_train_cli_inverse(tmp_path):
    rc = train_cli.main(
        _tiny_args(
            tmp_path,
            "--mode", "inverse",
            "--identify", "alpha",
            "--initial-guess", "alpha=0.5",
            "--obs-points", "64",
        )
    )
    assert rc == 0
    exp = next(Path(tmp_path).iterdir())
    hist = json.loads((exp / "history.json").read_text())
    assert "param_alpha" in hist
    assert len(hist["param_alpha"]) == 2
    meta = json.loads((exp / "metadata.json").read_text())
    assert meta["true_parameters"] == {"alpha": 0.01}
    assert "identified_parameters" in meta


def test_train_cli_failure_writes_metadata(tmp_path, monkeypatch):
    from pinnrl_tpu.training import trainer as trainer_mod

    def boom(*a, **k):
        raise RuntimeError("synthetic failure")

    monkeypatch.setattr(trainer_mod.PDETrainer, "train", boom)
    with pytest.raises(RuntimeError):
        train_cli.main(_tiny_args(tmp_path))
    exp = next(Path(tmp_path).iterdir())
    meta = json.loads((exp / "metadata.json").read_text())
    assert meta["status"] == "failed"
    assert "synthetic failure" in meta["error"]
    assert "traceback" in meta
    assert not (exp / ".running").exists()


def test_benchmark_cli_fdm(tmp_path, capsys):
    csv_path = tmp_path / "fdm.csv"
    rc = bench_cli.main(["fdm", "--pde", "heat", "--csv", str(csv_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "heat" in out and "l2_error" in out
    assert csv_path.exists()
    lines = csv_path.read_text().strip().split("\n")
    assert lines[0] == "pde,scheme,stability,l2_error"


def test_benchmark_cli_sampling(tmp_path, capsys):
    csv_path = tmp_path / "sampling.csv"
    rc = bench_cli.main(
        ["sampling", "--pde", "heat", "--strategies", "uniform",
         "--epochs", "3", "--batch", "32", "--csv", str(csv_path)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "uniform" in out
    assert csv_path.exists()


def test_benchmark_cli_inverse(tmp_path, capsys, monkeypatch):
    from pinnrl_tpu.benchmarks import inverse as inv

    tiny = dict(
        identify=["alpha"], guesses={"alpha": 0.1}, arch="feedforward",
        model=dict(hidden_dims=[16, 16]),
        training=dict(
            num_epochs=3, num_collocation_points=64, batch_size=32,
            num_boundary_points=16, num_initial_points=16, learning_rate=1e-2,
        ),
        obs=dict(num_points=32, noise=0.0),
    )
    monkeypatch.setitem(inv.RECIPES, "heat", tiny)
    csv_path = tmp_path / "inverse.csv"
    rc = bench_cli.main(["inverse", "--pde", "heat", "--csv", str(csv_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "alpha" in out
    lines = csv_path.read_text().strip().split("\n")
    assert lines[0].startswith("pde,parameter,true_value,initial_guess,identified,rel_error")
    fields = lines[1].split(",")
    assert fields[0] == "heat" and fields[1] == "alpha"
    assert float(fields[2]) == 0.01 and np.isfinite(float(fields[5]))
