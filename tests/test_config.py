"""Config system tests (analog of reference tests/unit_tests/test_config.py)."""

import pytest

from pinnrl_tpu.config import (
    Config,
    TrainingConfig,
    load_config,
)


def test_default_load():
    cfg = load_config()
    assert cfg.pde_type == "heat"
    assert cfg.pde.architecture == "fourier"
    assert cfg.model.input_dim == 2
    assert cfg.training.num_epochs == 3000
    assert cfg.training.loss_weights["residual"] == 15.0


def test_pde_overlay_precedence():
    cfg = load_config(pde_type="burgers")
    assert cfg.pde.architecture == "resnet"
    assert cfg.pde.parameters["nu"] == 0.01
    assert cfg.pde.domain == [[-1.0, 1.0]]


def test_architecture_override():
    cfg = load_config(pde_type="heat", architecture="siren")
    assert cfg.model.architecture == "siren"
    assert cfg.model.arch_params["omega_0"] == 30.0


def test_heat_2d():
    cfg = load_config(pde_type="heat_2d")
    assert cfg.pde.dimension == 2
    assert cfg.model.input_dim == 3
    assert len(cfg.pde.domain) == 2


def test_legacy_pde_loss_weight_key():
    t = TrainingConfig(loss_weights={"pde": 5.0, "boundary": 1.0})
    assert t.loss_weights["residual"] == 5.0


def test_invalid_values():
    with pytest.raises(ValueError):
        load_config(pde_type="navier_stokes")
    with pytest.raises(ValueError):
        load_config(architecture="transformer")
    with pytest.raises(ValueError):
        TrainingConfig(mode="bogus")
    with pytest.raises(ValueError):
        TrainingConfig(optimizer="sgd")
    with pytest.raises(ValueError):
        TrainingConfig(loss_function="l1")
    with pytest.raises(ValueError):
        TrainingConfig(collocation_distribution="sobol")


def test_inverse_requires_trainable():
    raw = load_config().raw
    raw["training"]["mode"] = "inverse"
    with pytest.raises(ValueError, match="trainable_parameters"):
        Config(config_dict=raw)


def test_inverse_with_trainable():
    raw = load_config().raw
    raw["training"]["mode"] = "inverse"
    raw["pde_configs"]["heat"]["trainable_parameters"] = ["alpha"]
    raw["pde_configs"]["heat"]["parameter_initial_guesses"] = {"alpha": 0.5}
    cfg = Config(config_dict=raw)
    assert cfg.pde.trainable_parameters == ["alpha"]
    assert cfg.pde.parameter_initial_guesses["alpha"] == 0.5


def test_device_fallback_cpu():
    cfg = load_config()
    # Under the test conftest the backend is cpu, so tpu request falls back.
    assert cfg.device == "cpu"


def test_to_dict_roundtrip():
    d = load_config(pde_type="kdv").to_dict()
    assert d["pde_type"] == "kdv"
    assert d["pde"]["parameters"]["speed"] == 1.0
    assert d["training"]["optimizer"] == "adam"


def test_dict_access_mixin():
    cfg = load_config()
    assert cfg.training.get("batch_size") == 2048
    assert cfg.training["num_epochs"] == 3000
    assert "mode" in cfg.training
    assert cfg.model.get("missing", 42) == 42
