"""Cross-field Config validation + YAML overlay depth tests
(reference: tests/unit_tests/test_config.py, 117 cases — this file plus
test_config.py / test_config_matrix.py are the TPU build's analog)."""

import pytest

from pinnrl_tpu.config import (
    AdaptiveWeightsConfig,
    Config,
    LearningRateSchedulerConfig,
    TrainingConfig,
    load_config,
)


# ---------------------------------------------------------------- _validate
@pytest.mark.parametrize(
    "training_block",
    [
        {"num_epochs": 0},
        {"num_epochs": -5},
        {"batch_size": 0},
        {"num_collocation_points": 0},
        {"adam_lbfgs_switch_ratio": 0.0},
        {"adam_lbfgs_switch_ratio": 1.0},
        {"adam_lbfgs_switch_ratio": -0.3},
        {"lbfgs": {"batch_size": 0}},
        {"lbfgs": {"resample_every": 0}},
    ],
)
def test_cross_field_training_errors(training_block):
    with pytest.raises(ValueError):
        load_config(config_dict={"training": training_block})


@pytest.mark.parametrize(
    "pde_block",
    [
        {"domain": [[1.0, 0.0]]},
        {"domain": [[0.0, 0.0]]},
        {"time_domain": [1.0, 0.0]},
        {"time_domain": [2.0, 2.0]},
    ],
)
def test_invalid_domains_rejected(pde_block):
    cfg_dict = {"pde_configs": {"heat": pde_block}}
    with pytest.raises(ValueError):
        load_config(config_dict=cfg_dict)


def test_trainable_parameter_must_exist():
    cfg_dict = {
        "training": {"mode": "inverse"},
        "pde_configs": {
            "heat": {
                "parameters": {"alpha": 0.05},
                "trainable_parameters": ["nu"],
            }
        },
    }
    with pytest.raises(ValueError, match="nu"):
        load_config(config_dict=cfg_dict)


def test_unknown_pde_type_rejected():
    with pytest.raises(ValueError, match="pde_type"):
        load_config(pde_type="navier_stokes")


# ------------------------------------------------------------- sub-configs
def test_unknown_scheduler_type_rejected():
    with pytest.raises(ValueError, match="scheduler_type"):
        LearningRateSchedulerConfig(scheduler_type="exponential")


@pytest.mark.parametrize("sched", ["cosine", "reduce_lr", "none"])
def test_valid_scheduler_types(sched):
    assert LearningRateSchedulerConfig(scheduler_type=sched).scheduler_type == sched


def test_unknown_adaptive_weights_strategy_rejected():
    with pytest.raises(ValueError, match="lrw|rbw"):
        AdaptiveWeightsConfig(strategy="softmax")


@pytest.mark.parametrize("strategy", ["lrw", "rbw"])
def test_valid_adaptive_weights_strategies(strategy):
    assert AdaptiveWeightsConfig(strategy=strategy).strategy == strategy


@pytest.mark.parametrize("bad", [{"ensemble_size": 0}, {"param_ema": 1.0}, {"param_ema": -0.1}])
def test_new_capability_fields_validated(bad):
    with pytest.raises(ValueError):
        TrainingConfig(**bad)


def test_loss_weights_pde_alias_does_not_clobber_residual():
    t = TrainingConfig(loss_weights={"pde": 3.0, "residual": 7.0})
    assert t.loss_weights["residual"] == 7.0
    t2 = TrainingConfig(loss_weights={"pde": 3.0})
    assert t2.loss_weights["residual"] == 3.0
    assert "pde" not in t2.loss_weights


# ------------------------------------------------- flat learning-rate keys
def test_flat_learning_rate_folds_into_optimizer_config():
    cfg = load_config(config_dict={"training": {"learning_rate": 0.037}})
    assert cfg.training.optimizer_config.learning_rate == pytest.approx(0.037)


def test_nested_optimizer_config_wins_over_flat():
    cfg = load_config(
        config_dict={
            "training": {
                "learning_rate": 0.037,
                "optimizer_config": {"learning_rate": 0.002},
            }
        }
    )
    assert cfg.training.optimizer_config.learning_rate == pytest.approx(0.002)


def test_flat_weight_decay_folds_into_optimizer_config():
    cfg = load_config(config_dict={"training": {"weight_decay": 0.25}})
    assert cfg.training.optimizer_config.weight_decay == pytest.approx(0.25)


# -------------------------------------------------------------- YAML blocks
def test_t_domain_alias_accepted():
    cfg = load_config(
        config_dict={"pde_configs": {"heat": {"t_domain": [0.0, 3.5]}}}
    )
    assert cfg.pde.time_domain == [0.0, 3.5]


@pytest.mark.parametrize(
    "arch,param",
    [
        ("fourier", "mapping_size"),
        ("siren", "omega_0"),
        ("fno", "modes"),
        ("attention", "num_heads"),
        ("autoencoder", "latent_dim"),
    ],
)
def test_architecture_params_injected_from_yaml(arch, param):
    cfg = load_config(pde_type="heat", architecture=arch)
    assert param in cfg.model.arch_params


def test_resnet_block_geometry_from_yaml():
    cfg = load_config(pde_type="heat", architecture="resnet")
    assert cfg.model.hidden_dim == 512
    assert cfg.model.num_blocks == 7
    assert cfg.model.hidden_dims == [512] * 7


@pytest.mark.parametrize("requested", ["mps", "cuda", "tpu"])
def test_reference_device_names_resolve(requested):
    # On a CPU-only test host the accelerator intent falls back to cpu;
    # under a real TPU backend it resolves to the accelerator. Either way
    # the result is a valid device string and never the torch name.
    cfg = load_config(config_dict={"device": requested})
    assert cfg.device in ("cpu", "tpu", "axon")


def test_rl_defaults_match_reference():
    cfg = load_config()
    assert cfg.rl.epsilon_start == 1.0
    assert cfg.rl.epsilon_decay == 0.995
    assert cfg.rl.memory_size == 10000
    assert cfg.rl.batch_size == 124
    assert cfg.rl.target_update == 100
    assert set(cfg.rl.reward_weights) == {
        "residual", "boundary", "initial", "exploration",
    }


def test_from_snapshot_preserves_flat_lr():
    cfg = load_config(config_dict={"training": {"learning_rate": 0.011}})
    back = Config.from_snapshot(cfg.to_dict())
    assert back.training.optimizer_config.learning_rate == pytest.approx(0.011)
