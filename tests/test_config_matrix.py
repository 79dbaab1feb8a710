"""Config validation matrix (depth analog of the reference's 117-case
tests/unit_tests/test_config.py): parametrized loads across every PDE and
architecture, domain/alias normalization, validation errors, nested blocks,
and override precedence."""

import dataclasses

import pytest

from pinnrl_tpu.config import (
    VALID_ARCHITECTURES,
    VALID_PDES,
    Config,
    ModelConfig,
    PDESettings,
    TrainingConfig,
    load_config,
)

ARCHS = sorted(VALID_ARCHITECTURES)
PDES = sorted(VALID_PDES)


@pytest.mark.parametrize("pde", PDES)
def test_every_pde_loads(pde):
    cfg = load_config(pde_type=pde)
    assert cfg.pde_type == pde
    assert cfg.model.input_dim == cfg.pde.dimension + 1
    assert cfg.pde.time_domain[1] > cfg.pde.time_domain[0]
    for lo, hi in cfg.pde.domain:
        assert hi > lo


@pytest.mark.parametrize("arch", ARCHS)
def test_every_architecture_loads(arch):
    cfg = load_config(pde_type="heat", architecture=arch)
    assert cfg.model.architecture == arch
    assert cfg.model.hidden_dims


@pytest.mark.parametrize("pde", PDES)
def test_snapshot_roundtrip_every_pde(pde):
    cfg = load_config(pde_type=pde)
    back = Config.from_snapshot(cfg.to_dict())
    assert back.pde_type == pde
    assert back.model.architecture == cfg.model.architecture
    assert back.pde.dimension == cfg.pde.dimension
    assert back.training.num_epochs == cfg.training.num_epochs


@pytest.mark.parametrize(
    "field,value",
    [
        ("mode", "predictive"),
        ("optimizer", "rmsprop"),
        ("loss_function", "l2"),
        ("collocation_distribution", "grid"),
        ("residual_dtype", "float16"),
    ],
)
def test_training_validation_errors(field, value):
    with pytest.raises(ValueError):
        TrainingConfig(**{field: value})


@pytest.mark.parametrize(
    "mode", ["forward", "inverse", "data_only", "data_augmented"]
)
def test_valid_modes_accepted(mode):
    assert TrainingConfig(mode=mode).mode == mode


@pytest.mark.parametrize("opt", ["adam", "lbfgs", "adam_lbfgs"])
def test_valid_optimizers_accepted(opt):
    assert TrainingConfig(optimizer=opt).optimizer == opt


@pytest.mark.parametrize("lf", ["mse", "mae", "huber"])
def test_valid_loss_functions_accepted(lf):
    assert TrainingConfig(loss_function=lf).loss_function == lf


@pytest.mark.parametrize(
    "strategy", ["uniform", "stratified", "residual_based", "adaptive"]
)
def test_valid_strategies_accepted(strategy):
    assert TrainingConfig(collocation_distribution=strategy).collocation_distribution == strategy


def test_unknown_architecture_rejected():
    with pytest.raises(ValueError):
        ModelConfig(architecture="transformer")


def test_hidden_dims_derived_from_hidden_dim():
    m = ModelConfig(arch_params={"hidden_dim": 32, "num_blocks": 3})
    assert m.hidden_dims == [32, 32, 32]


def test_hidden_dims_explicit_wins():
    m = ModelConfig(
        hidden_dims=[64, 64],
        arch_params={"hidden_dim": 32, "_hidden_dims_explicit": True},
    )
    assert m.hidden_dims == [64, 64]


def test_num_layers_alias():
    m = ModelConfig(arch_params={"hidden_dim": 16, "num_layers": 5})
    assert m.hidden_dims == [16] * 5


@pytest.mark.parametrize(
    "domain,expect",
    [
        ([0.0, 1.0], [[0.0, 1.0]]),
        ([[0.0, 1.0]], [[0.0, 1.0]]),
        ([[0.0, 1.0], [-1.0, 2.0]], [[0.0, 1.0], [-1.0, 2.0]]),
        (None, [[0.0, 1.0]]),
    ],
)
def test_domain_normalization(domain, expect):
    from pinnrl_tpu.config import _normalize_domain

    assert _normalize_domain(domain) == expect


def test_t_domain_alias():
    raw = load_config().raw
    block = raw["pde_configs"]["heat"]
    block["t_domain"] = block.pop("time_domain")
    cfg = Config(config_dict=raw)
    assert cfg.pde.time_domain[1] > cfg.pde.time_domain[0]


@pytest.mark.parametrize(
    "mutate,match",
    [
        (lambda r: r["training"].update(num_epochs=0), "num_epochs"),
        (lambda r: r["training"].update(batch_size=-1), "batch_size"),
        (lambda r: r["training"].update(num_collocation_points=0), "collocation"),
        (lambda r: r["training"].update(adam_lbfgs_switch_ratio=1.5), "switch_ratio"),
        (lambda r: r["pde_configs"]["heat"].update(domain=[[1.0, 0.0]]), "domain"),
        (lambda r: r["pde_configs"]["heat"].update(time_domain=[1.0, 0.0]), "time domain"),
        (lambda r: r["pde_configs"]["heat"].update(input_dim=5), "input_dim"),
    ],
)
def test_cross_field_validation_errors(mutate, match):
    raw = load_config().raw
    mutate(raw)
    with pytest.raises(ValueError, match=match):
        Config(config_dict=raw)


def test_trainable_parameter_must_exist():
    raw = load_config().raw
    raw["training"]["mode"] = "inverse"
    raw["pde_configs"]["heat"]["trainable_parameters"] = ["gamma"]
    with pytest.raises(ValueError, match="gamma"):
        Config(config_dict=raw)


def test_nested_optimizer_block():
    raw = load_config().raw
    raw["training"]["optimizer_config"] = {"learning_rate": 0.01, "beta1": 0.8}
    cfg = Config(config_dict=raw)
    assert cfg.training.optimizer_config.learning_rate == 0.01
    assert cfg.training.optimizer_config.beta1 == 0.8


def test_early_stopping_block():
    raw = load_config().raw
    raw["training"]["early_stopping"] = {"enabled": True, "patience": 3}
    cfg = Config(config_dict=raw)
    assert cfg.training.early_stopping.enabled
    assert cfg.training.early_stopping.patience == 3


def test_adaptive_weights_block():
    raw = load_config().raw
    raw["training"]["adaptive_weights"] = {"enabled": True, "strategy": "rbw"}
    cfg = Config(config_dict=raw)
    assert cfg.training.adaptive_weights.enabled
    assert cfg.training.adaptive_weights.strategy == "rbw"


def test_lbfgs_block():
    raw = load_config().raw
    raw["training"]["lbfgs"] = {"history_size": 25}
    cfg = Config(config_dict=raw)
    assert cfg.training.lbfgs.history_size == 25


def test_unknown_keys_ignored():
    raw = load_config().raw
    raw["training"]["not_a_real_key"] = 42
    cfg = Config(config_dict=raw)  # must not raise
    assert not hasattr(cfg.training, "not_a_real_key")


def test_pde_settings_fields_complete():
    names = {f.name for f in dataclasses.fields(PDESettings)}
    for required in (
        "pde_type", "dimension", "domain", "time_domain", "parameters",
        "boundary_conditions", "initial_condition", "exact_solution",
        "trainable_parameters", "parameter_initial_guesses",
        "observation_data", "observation_noise",
    ):
        assert required in names


@pytest.mark.parametrize("pde", ["heat", "burgers", "kdv", "wave"])
def test_config_dict_access_matrix(pde):
    cfg = load_config(pde_type=pde)
    assert cfg["pde_type"] == pde
    assert cfg.get("training") is cfg.training
    assert cfg.training.get("nonexistent", "d") == "d"


def test_lbfgs_batch_size_block():
    raw = load_config().raw
    raw["training"]["lbfgs"] = {"batch_size": 4096}
    cfg = Config(config_dict=raw)
    assert cfg.training.lbfgs.batch_size == 4096


def test_lbfgs_batch_size_validation():
    raw = load_config().raw
    raw["training"]["lbfgs"] = {"batch_size": -1}
    with pytest.raises(ValueError, match="lbfgs.batch_size"):
        Config(config_dict=raw)
