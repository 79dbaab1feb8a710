"""Synthetic Well cache + FNO operator benchmark (headline config #5's
"The Well dataset FNO operator run", offline via the loader-cache injection
point — see pinnrl_tpu/datasets/synthetic.py)."""

import numpy as np
import pytest

from pinnrl_tpu.datasets import get_entry, load_well_slice
from pinnrl_tpu.datasets.synthetic import (
    ensure_synthetic_well_cache,
    generate_heat_2d_trajectory,
)


@pytest.fixture(autouse=True)
def _tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("PINNRL_WELL_CACHE", str(tmp_path / "well"))


def test_registry_entry_is_marked_synthetic():
    e = get_entry("synthetic_heat_2d")
    assert "synthetic" in e.description.lower()
    assert e.recommended_mode == "data_only"
    assert e.default_architecture == "fno"
    assert e.n_spatial_dims == 2


def test_trajectory_is_exact_heat_solution():
    """The generated grid field satisfies u_t = alpha*lap(u) (checked by
    finite differences on the grid)."""
    from pinnrl_tpu.datasets.synthetic import ALPHA

    f = generate_heat_2d_trajectory(0, n_steps=48, nx=96, ny=96)[..., 0]
    e = get_entry("synthetic_heat_2d")
    (x_lo, x_hi), _ = e.domain
    t_lo, t_hi = e.time_domain
    dt = (t_hi - t_lo) / 47
    dx = (x_hi - x_lo) / 95
    interior = np.s_[1:-1, 1:-1, 1:-1]
    u_t = (f[2:, 1:-1, 1:-1] - f[:-2, 1:-1, 1:-1]) / (2 * dt)
    lap = (
        f[1:-1, 2:, 1:-1] + f[1:-1, :-2, 1:-1]
        + f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2]
        - 4 * f[interior]
    ) / dx**2
    resid = u_t - ALPHA * lap
    assert float(np.abs(resid).max()) < 5e-3


def test_cache_serves_loader_without_the_well():
    path = ensure_synthetic_well_cache(n_traj=1, n_points=256, seed=3)
    assert path.exists()
    out = load_well_slice("synthetic_heat_2d", n_traj=1, n_points=256, seed=3)
    assert out["x"].shape == (256, 2)
    assert out["t"].shape == (256, 1)
    assert out["u"].shape == (256, 1)
    assert np.isfinite(out["u"]).all()
    # Points lie inside the registry domain.
    e = get_entry("synthetic_heat_2d")
    for d in range(2):
        lo, hi = e.domain[d]
        assert out["x"][:, d].min() >= lo and out["x"][:, d].max() <= hi


def test_train_test_splits_differ():
    ensure_synthetic_well_cache(split="train", n_traj=1, n_points=256, seed=0)
    ensure_synthetic_well_cache(split="test", n_traj=1, n_points=256, seed=0)
    tr = load_well_slice("synthetic_heat_2d", split="train", n_traj=1,
                         n_points=256, seed=0)
    te = load_well_slice("synthetic_heat_2d", split="test", n_traj=1,
                         n_points=256, seed=0)
    assert not np.allclose(tr["u"], te["u"])


def test_refuses_real_dataset_names():
    with pytest.raises(ValueError, match="refusing"):
        ensure_synthetic_well_cache(name="active_matter")


def test_operator_benchmark_smoke_and_csv():
    from pinnrl_tpu.benchmarks.operator import (
        results_to_csv,
        run_operator_benchmark,
    )

    r = run_operator_benchmark(epochs=2, n_traj=1, n_points=256)
    assert r.dataset == "synthetic_heat_2d"
    assert r.architecture == "fno" and r.mode == "data_only"
    assert np.isfinite(r.test_rel_l2) and np.isfinite(r.final_train_loss)
    csv = results_to_csv([r])
    assert csv.startswith("dataset,architecture,mode,epochs")
    assert "synthetic_heat_2d,fno,data_only,2,256," in csv


def test_operator_cli(tmp_path, capsys):
    from pinnrl_tpu.benchmarks import cli

    rc = cli.main(["operator", "--epochs", "2", "--traj", "1",
                   "--points", "256", "--csv", str(tmp_path / "op.csv")])
    assert rc == 0
    assert "test_rel_l2" in capsys.readouterr().out
    assert (tmp_path / "op.csv").read_text().startswith("dataset,")


def test_splits_are_disjoint_trajectories_for_multi_traj():
    # Regression: test split used offset=2, so n_traj>=3 put trajectory 2 in
    # BOTH splits (train->test leakage). Test indices now start at n_traj.
    from pinnrl_tpu.datasets.synthetic import generate_heat_2d_trajectory

    n_traj = 3
    train_fields = [generate_heat_2d_trajectory(i) for i in range(n_traj)]
    test_fields = [generate_heat_2d_trajectory(i + n_traj) for i in range(n_traj)]
    for te in test_fields:
        for tr in train_fields:
            assert not np.allclose(te, tr)


def test_splits_are_disjoint_points_of_same_field():
    """Train/test = disjoint point subsets of the SAME field (a point-wise
    model has no input-function conditioning, so cross-trajectory splits
    would be ill-posed — see datasets/synthetic.py)."""
    ensure_synthetic_well_cache(split="train", n_traj=1, n_points=200, seed=4)
    ensure_synthetic_well_cache(split="test", n_traj=1, n_points=200, seed=4)
    tr = load_well_slice("synthetic_heat_2d", split="train", n_traj=1,
                         n_points=200, seed=4)
    te = load_well_slice("synthetic_heat_2d", split="test", n_traj=1,
                         n_points=200, seed=4)
    tr_keys = {tuple(np.r_[x, t]) for x, t in zip(tr["x"], tr["t"])}
    te_keys = {tuple(np.r_[x, t]) for x, t in zip(te["x"], te["t"])}
    assert len(tr_keys & te_keys) == 0
    assert len(tr_keys) == len(te_keys) == 200
