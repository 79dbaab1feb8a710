"""Well loader tests WITHOUT the_well installed: a fake module is spliced into
sys.modules (reference pattern: tests/unit_tests/test_well_loader.py:22-51)."""

import sys
import types

import numpy as np
import pytest

from pinnrl_tpu.datasets import (
    WELL_REGISTRY,
    TheWellNotInstalledError,
    get_entry,
    list_dataset_names,
    load_well_slice,
    resolve_path,
)


class _FakeWellDataset:
    """Synthetic trajectories shaped like the_well.data.WellDataset samples."""

    def __init__(self, well_base_path, well_dataset_name, well_split_name):
        self.name = well_dataset_name
        entry = get_entry(well_dataset_name)
        shape = (4,) + (8,) * entry.n_spatial_dims + (len(entry.fields),)
        rng = np.random.default_rng(0)
        self._fields = rng.normal(size=shape).astype(np.float32)

    def __len__(self):
        return 3

    def __getitem__(self, i):
        return {"input_fields": self._fields + i}


@pytest.fixture
def fake_well(monkeypatch, tmp_path):
    mod = types.ModuleType("the_well")
    data_mod = types.ModuleType("the_well.data")
    data_mod.WellDataset = _FakeWellDataset
    mod.data = data_mod
    monkeypatch.setitem(sys.modules, "the_well", mod)
    monkeypatch.setitem(sys.modules, "the_well.data", data_mod)
    monkeypatch.setenv("PINNRL_WELL_CACHE", str(tmp_path / "cache"))
    return tmp_path


def test_registry_invariants():
    # 12 real Well datasets + the clearly-marked synthetic offline stand-in.
    assert len(WELL_REGISTRY) == 13
    assert "synthetic_heat_2d" in WELL_REGISTRY
    for entry in WELL_REGISTRY.values():
        assert entry.default_input_dim == entry.n_spatial_dims + 1
        assert entry.default_output_dim == len(entry.fields)
    assert "active_matter" in list_dataset_names()
    assert get_entry("active_matter").default_output_dim == 11
    with pytest.raises(KeyError, match="Unknown Well dataset"):
        get_entry("nonexistent")


def test_resolve_path():
    assert resolve_path(None) == "hf://datasets/polymathic-ai/"
    assert resolve_path("") == "hf://datasets/polymathic-ai/"
    assert resolve_path("/data/well") == "/data/well"


def test_missing_dependency_error(monkeypatch, tmp_path):
    monkeypatch.setenv("PINNRL_WELL_CACHE", str(tmp_path))
    monkeypatch.setitem(sys.modules, "the_well", None)
    with pytest.raises((TheWellNotInstalledError, ImportError)):
        load_well_slice("active_matter", n_points=16, use_cache=False)


def test_flatten_and_subsample(fake_well):
    out = load_well_slice("gray_scott_reaction_diffusion", n_traj=2, n_points=100, seed=0)
    assert out["x"].shape == (100, 2)
    assert out["t"].shape == (100, 1)
    assert out["u"].shape == (100, 2)  # gray-scott: fields (A, B)
    entry = get_entry("gray_scott_reaction_diffusion")
    for d in range(2):
        lo, hi = entry.domain[d]
        assert out["x"][:, d].min() >= lo and out["x"][:, d].max() <= hi


def test_cache_roundtrip(fake_well):
    out1 = load_well_slice("shear_flow", n_points=50, seed=1)
    # Remove the fake module: a cache hit must not need the import.
    sys.modules.pop("the_well", None)
    sys.modules.pop("the_well.data", None)
    out2 = load_well_slice("shear_flow", n_points=50, seed=1)
    np.testing.assert_allclose(out1["u"], out2["u"])


def test_cache_partitioned_by_base(fake_well):
    out1 = load_well_slice("shear_flow", n_points=30, seed=2, base=None)
    out2 = load_well_slice("shear_flow", n_points=30, seed=2, base="/some/local/dir")
    cache_dir = fake_well / "cache"
    files = list(cache_dir.glob("shear_flow*"))
    assert len(files) == 2  # different base -> different cache key
    np.testing.assert_allclose(out1["u"], out2["u"])  # same fake data though


def test_training_modes_gate_physics(fake_well):
    """data_only zeroes physics terms; data_augmented keeps both
    (reference: test_train_data_modes.py:81-113)."""
    import jax
    import jax.numpy as jnp

    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from tests.test_utils import tiny_config

    for mode, physics_active in [("data_only", False), ("data_augmented", True)]:
        cfg = tiny_config(pde_type="heat", mode=mode)
        pde = create_pde(cfg)
        pde.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=32)
        model = PINNModel(cfg)
        key = jax.random.PRNGKey(0)
        x, t = pde.generate_collocation_points(key, 16)
        losses = pde.compute_loss(model.apply, model.params, x, t, key=key)
        assert float(losses["data"]) > 0
        lw = cfg.training.loss_weights
        physics = (
            lw["residual"] * losses["residual"]
            + lw["boundary"] * losses["boundary"]
            + lw["initial"] * losses["initial"]
        )
        data_term = lw["data"] * losses["data"]
        if physics_active:
            assert float(losses["total"]) > float(data_term)
        else:
            expected = float(data_term + lw["smoothness"] * losses["smoothness"])
            np.testing.assert_allclose(float(losses["total"]), expected, rtol=1e-5)
