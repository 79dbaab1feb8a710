"""Reference-depth config matrix (VERDICT round-2 item 5).

Mirrors the reference's 117-case YAML->dataclass suite
(reference: tests/unit_tests/test_config.py): section typing, per-section
to_dict content, dict access corners, ModelConfig geometry derivation,
TrainingConfig __post_init__ defaults and normalizations, per-architecture
param injection, PDE-block selection, scheduler loading, and the default
YAML's pinned values. Together with test_config*.py this brings the config
surface past 100 cases.
"""

import dataclasses

import pytest

from pinnrl_tpu.config import (
    AdaptiveWeightsConfig,
    Config,
    EarlyStoppingConfig,
    EvaluationConfig,
    LBFGSConfig,
    LearningRateSchedulerConfig,
    LoggingConfig,
    ModelConfig,
    OptimizerConfig,
    PathsConfig,
    PDESettings,
    RLConfig,
    TrainingConfig,
    load_config,
)


@pytest.fixture(scope="module")
def cfg():
    return load_config(pde_type="heat", architecture="fourier")


# ------------------------------------------------------------------ #
# Section typing (reference: TestConfigDefaultLoading)
# ------------------------------------------------------------------ #


class TestSectionTypes:
    def test_model_is_model_config(self, cfg):
        assert isinstance(cfg.model, ModelConfig)

    def test_pde_is_pde_settings(self, cfg):
        assert isinstance(cfg.pde, PDESettings)

    def test_training_is_training_config(self, cfg):
        assert isinstance(cfg.training, TrainingConfig)

    def test_rl_is_rl_config(self, cfg):
        assert isinstance(cfg.rl, RLConfig)

    def test_paths_is_paths_config(self, cfg):
        assert isinstance(cfg.paths, PathsConfig)

    def test_evaluation_is_evaluation_config(self, cfg):
        assert isinstance(cfg.evaluation, EvaluationConfig)

    def test_logging_is_logging_config(self, cfg):
        assert isinstance(cfg.logging, LoggingConfig)

    def test_pde_type_stored(self, cfg):
        assert cfg.pde_type == "heat"

    def test_device_is_string(self, cfg):
        assert isinstance(cfg.device, str) and cfg.device in ("cpu", "tpu", "axon")

    def test_optimizer_config_nested(self, cfg):
        assert isinstance(cfg.training.optimizer_config, OptimizerConfig)

    def test_scheduler_config_nested(self, cfg):
        assert isinstance(cfg.training.lr_scheduler, LearningRateSchedulerConfig)

    def test_lbfgs_config_nested(self, cfg):
        assert isinstance(cfg.training.lbfgs, LBFGSConfig)


# ------------------------------------------------------------------ #
# to_dict per-section content (reference: TestToDict)
# ------------------------------------------------------------------ #


class TestToDict:
    def test_returns_dict(self, cfg):
        assert isinstance(cfg.to_dict(), dict)

    def test_top_level_keys(self, cfg):
        d = cfg.to_dict()
        for k in ("pde_type", "device", "pde", "model", "training", "rl",
                  "evaluation", "logging", "paths"):
            assert k in d, k

    def test_model_section(self, cfg):
        m = cfg.to_dict()["model"]
        assert m["architecture"] == "fourier"
        assert m["input_dim"] == 2
        assert isinstance(m["hidden_dims"], list)

    def test_training_section(self, cfg):
        t = cfg.to_dict()["training"]
        assert t["num_epochs"] == cfg.training.num_epochs
        assert t["optimizer_config"]["learning_rate"] == pytest.approx(
            cfg.training.optimizer_config.learning_rate
        )

    def test_pde_section(self, cfg):
        p = cfg.to_dict()["pde"]
        assert p["pde_type"] == "heat"
        assert isinstance(p["domain"], list)

    def test_rl_section(self, cfg):
        r = cfg.to_dict()["rl"]
        assert set(r["reward_weights"]) == {
            "residual", "boundary", "initial", "exploration"
        }

    def test_preserves_loss_weights(self, cfg):
        t = cfg.to_dict()["training"]
        assert t["loss_weights"] == cfg.training.loss_weights

    def test_json_serializable(self, cfg):
        import json

        json.dumps(cfg.to_dict())


# ------------------------------------------------------------------ #
# Dict access corners (reference: TestConfigDictAccess)
# ------------------------------------------------------------------ #


class TestDictAccess:
    def test_getitem_model(self, cfg):
        assert cfg["model"] is cfg.model

    def test_getitem_training(self, cfg):
        assert cfg["training"] is cfg.training

    def test_getitem_pde(self, cfg):
        assert cfg["pde"] is cfg.pde

    def test_get_existing_key(self, cfg):
        assert cfg.get("pde_type") == "heat"

    def test_get_missing_key_returns_default(self, cfg):
        assert cfg.get("nonexistent", 42) == 42

    def test_getitem_missing_key_raises(self, cfg):
        with pytest.raises(KeyError):
            cfg["nonexistent"]

    def test_nested_get_on_training(self, cfg):
        assert cfg.training.get("batch_size") == cfg.training.batch_size

    def test_nested_get_on_model(self, cfg):
        assert cfg.model.get("architecture") == "fourier"


# ------------------------------------------------------------------ #
# ModelConfig geometry (reference: TestModelConfig)
# ------------------------------------------------------------------ #


class TestModelConfigGeometry:
    def test_basic_construction(self):
        m = ModelConfig(architecture="feedforward", input_dim=3, output_dim=2)
        assert m.input_dim == 3 and m.output_dim == 2

    def test_hidden_dims_from_hidden_dim_and_num_blocks(self):
        m = ModelConfig(arch_params={"hidden_dim": 64, "num_blocks": 3})
        assert m.hidden_dims == [64, 64, 64]

    def test_hidden_dims_from_num_layers_alias(self):
        m = ModelConfig(arch_params={"hidden_dim": 32, "num_layers": 5})
        assert m.hidden_dims == [32] * 5

    def test_explicit_hidden_dims_win(self):
        m = ModelConfig(
            hidden_dims=[10, 20],
            arch_params={"hidden_dim": 64, "_hidden_dims_explicit": True},
        )
        assert m.hidden_dims == [10, 20]

    def test_hidden_dim_property_falls_back_to_first(self):
        m = ModelConfig(hidden_dims=[48, 96])
        assert m.hidden_dim == 48

    def test_num_blocks_property_falls_back_to_len(self):
        m = ModelConfig(hidden_dims=[48, 96, 128])
        assert m.num_blocks == 3

    def test_unknown_architecture_raises(self):
        with pytest.raises(ValueError, match="architecture"):
            ModelConfig(architecture="transformerxl")

    def test_default_optional_fields(self):
        m = ModelConfig()
        assert m.dropout == 0.0
        assert m.activation == "tanh"
        assert m.hard_ic is False


# ------------------------------------------------------------------ #
# TrainingConfig post-init semantics (reference: TestTrainingConfig,
# TestBugFixLossWeightsNormalization)
# ------------------------------------------------------------------ #


class TestTrainingConfigSemantics:
    def test_default_loss_weights_present(self):
        t = TrainingConfig()
        assert set(t.loss_weights) >= {"residual", "boundary", "initial"}

    def test_pde_key_normalized_to_residual(self):
        t = TrainingConfig(loss_weights={"pde": 7.0, "boundary": 1.0})
        assert t.loss_weights["residual"] == 7.0
        assert "pde" not in t.loss_weights

    def test_residual_key_untouched_when_both(self):
        t = TrainingConfig(loss_weights={"pde": 7.0, "residual": 3.0})
        assert t.loss_weights["residual"] == 3.0

    def test_collocation_distribution_default(self):
        assert TrainingConfig().collocation_distribution == "uniform"

    def test_adaptive_weights_default_disabled(self):
        assert TrainingConfig().adaptive_weights.enabled is False

    def test_explicit_adaptive_weights_preserved(self):
        aw = AdaptiveWeightsConfig(enabled=True, strategy="lrw")
        t = TrainingConfig(adaptive_weights=aw)
        assert t.adaptive_weights.strategy == "lrw"

    def test_early_stopping_default(self):
        es = TrainingConfig().early_stopping
        assert isinstance(es, EarlyStoppingConfig) and es.patience == 100

    @pytest.mark.parametrize("mode", ["forward", "inverse", "data_only", "data_augmented"])
    def test_all_modes_construct(self, mode):
        assert TrainingConfig(mode=mode).mode == mode

    @pytest.mark.parametrize(
        "field,value",
        [
            ("mode", "sideways"),
            ("optimizer", "sgd"),
            ("loss_function", "l1"),
            ("collocation_distribution", "sobol"),
            ("residual_dtype", "float16"),
            ("ensemble_size", 0),
            ("stacked_jet", "maybe"),
            ("param_ema", 1.5),
        ],
    )
    def test_invalid_field_values_raise(self, field, value):
        with pytest.raises(ValueError):
            TrainingConfig(**{field: value})


# ------------------------------------------------------------------ #
# Dataclass instantiation (reference: TestDataclassInstantiation)
# ------------------------------------------------------------------ #


class TestDataclassInstantiation:
    def test_lr_scheduler_config(self):
        s = LearningRateSchedulerConfig(scheduler_type="reduce_lr", factor=0.1)
        assert s.factor == 0.1

    def test_lr_scheduler_rejects_unknown(self):
        with pytest.raises(ValueError):
            LearningRateSchedulerConfig(scheduler_type="exponential")

    def test_early_stopping_config(self):
        es = EarlyStoppingConfig(enabled=False, patience=7)
        assert es.patience == 7

    def test_lbfgs_config(self):
        lb = LBFGSConfig(history_size=10, max_iter=5)
        assert lb.line_search_fn == "strong_wolfe"

    def test_adaptive_weights_defaults(self):
        aw = AdaptiveWeightsConfig()
        assert aw.strategy == "rbw" and len(aw.initial_weights) == 3

    def test_adaptive_weights_rejects_unknown_strategy(self):
        with pytest.raises(ValueError):
            AdaptiveWeightsConfig(strategy="uncertainty")

    def test_rl_config_defaults_match_reference(self):
        r = RLConfig()
        assert r.epsilon_decay == 0.995
        assert r.memory_size == 10000
        assert r.batch_size == 124
        assert r.target_update == 100

    def test_evaluation_config(self):
        e = EvaluationConfig(num_points=123)
        assert e.num_points == 123 and "l2_error" in e.metrics

    def test_logging_config(self):
        assert LoggingConfig().level == "INFO"

    def test_paths_config(self):
        assert PathsConfig().results_dir == "experiments"

    def test_pde_settings_defaults(self):
        p = PDESettings()
        assert p.pde_type == "heat" and p.dimension == 1


# ------------------------------------------------------------------ #
# Architecture param injection (reference: TestArchitectureParamInjection)
# ------------------------------------------------------------------ #


class TestArchParamInjection:
    def test_fourier_mapping_size(self):
        c = load_config(pde_type="heat", architecture="fourier")
        assert "mapping_size" in c.model.arch_params

    def test_fourier_scale(self):
        c = load_config(pde_type="heat", architecture="fourier")
        assert "scale" in c.model.arch_params

    def test_siren_omega_0(self):
        c = load_config(pde_type="heat", architecture="siren")
        assert "omega_0" in c.model.arch_params

    def test_attention_heads(self):
        c = load_config(pde_type="heat", architecture="attention")
        assert any(k in c.model.arch_params for k in ("num_heads", "n_heads"))

    def test_autoencoder_latent_dim(self):
        c = load_config(pde_type="heat", architecture="autoencoder")
        assert any("latent" in k for k in c.model.arch_params)

    def test_fno_modes(self):
        c = load_config(pde_type="heat", architecture="fno")
        assert "modes" in c.model.arch_params

    def test_resnet_geometry(self):
        c = load_config(pde_type="heat", architecture="resnet")
        assert c.model.num_blocks >= 1

    @pytest.mark.parametrize(
        "arch",
        ["feedforward", "resnet", "siren", "fourier", "fno", "attention", "autoencoder"],
    )
    def test_arch_block_applied(self, arch):
        c = load_config(pde_type="heat", architecture=arch)
        assert c.model.architecture == arch


# ------------------------------------------------------------------ #
# PDE block selection (reference: TestPDEConfigSelection)
# ------------------------------------------------------------------ #


class TestPDESelection:
    def test_heat_selected_by_default(self):
        assert Config().pde_type == "heat"

    def test_custom_pde_type(self):
        assert load_config(pde_type="kdv").pde.pde_type == "kdv"

    def test_unknown_pde_type_raises(self):
        with pytest.raises(ValueError, match="pde_type"):
            load_config(pde_type="navier_stokes_42")

    def test_input_dim_follows_dimension(self):
        c = load_config(pde_type="heat_2d")
        assert c.model.input_dim == c.pde.dimension + 1 == 3

    def test_output_dim_from_pde_block(self):
        c = load_config(pde_type="heat")
        assert c.model.output_dim == 1

    def test_black_scholes_domain(self):
        c = load_config(pde_type="black_scholes")
        lo, hi = c.pde.domain[0]
        assert hi > lo >= 0.0

    def test_pendulum_parameters(self):
        c = load_config(pde_type="pendulum")
        assert "g" in c.pde.parameters and "L" in c.pde.parameters


# ------------------------------------------------------------------ #
# Scheduler loading (reference: TestSchedulerConfigLoading)
# ------------------------------------------------------------------ #


class TestSchedulerLoading:
    def test_cosine_params(self):
        c = Config(config_dict={
            "training": {"scheduler_type": "cosine", "cosine_params": {"T_max": 99}}
        })
        assert c.training.lr_scheduler.scheduler_type == "cosine"
        assert c.training.lr_scheduler.T_max == 99

    def test_reduce_lr_params(self):
        c = Config(config_dict={
            "training": {
                "scheduler_type": "reduce_lr",
                "reduce_lr_params": {"factor": 0.25, "patience": 9},
            }
        })
        s = c.training.lr_scheduler
        assert s.factor == 0.25 and s.patience == 9

    def test_snapshot_nested_lr_scheduler_block(self):
        c = Config(config_dict={
            "training": {"lr_scheduler": {"scheduler_type": "none"}, "scheduler_type": "none"}
        })
        assert c.training.lr_scheduler.scheduler_type == "none"


# ------------------------------------------------------------------ #
# Default YAML pinned values (reference: TestDefaultConfigYAMLValues)
# ------------------------------------------------------------------ #


class TestDefaultYAMLValues:
    def test_default_num_epochs(self, cfg):
        assert cfg.training.num_epochs == 3000

    def test_default_batch_size(self, cfg):
        assert cfg.training.batch_size == 2048

    def test_default_collocation_points(self, cfg):
        assert cfg.training.num_collocation_points == 5000

    def test_loss_weights_from_yaml(self, cfg):
        lw = cfg.training.loss_weights
        assert lw["residual"] == 15.0
        assert lw["boundary"] == 20.0
        assert lw["initial"] == 10.0

    def test_rl_disabled_by_default(self, cfg):
        assert cfg.rl.enabled is False

    def test_heat_architecture_is_fourier(self):
        assert load_config(pde_type="heat").pde.architecture == "fourier"

    def test_early_stopping_enabled_by_default(self, cfg):
        assert cfg.training.early_stopping.enabled is True

    def test_collocation_distribution_uniform(self, cfg):
        assert cfg.training.collocation_distribution == "uniform"

    def test_adaptive_weights_disabled(self, cfg):
        assert cfg.training.adaptive_weights.enabled is False

    def test_every_pde_block_has_domain_and_exact(self):
        raw = Config().raw
        for key, block in raw["pde_configs"].items():
            assert "domain" in block, key


# ------------------------------------------------------------------ #
# Snapshot round-trip per section (reference gap called out in VERDICT)
# ------------------------------------------------------------------ #


class TestSnapshotRoundtrip:
    @pytest.mark.parametrize(
        "arch",
        ["feedforward", "resnet", "siren", "fourier", "fno", "attention", "autoencoder"],
    )
    def test_roundtrip_every_architecture(self, arch):
        c = load_config(pde_type="heat", architecture=arch)
        c2 = Config.from_snapshot(c.to_dict())
        assert c2.model.architecture == arch
        assert c2.model.hidden_dims == c.model.hidden_dims
        assert c2.training.num_epochs == c.training.num_epochs

    def test_roundtrip_preserves_rl_section(self):
        c = load_config(pde_type="heat")
        c.rl.enabled = True
        c2 = Config.from_snapshot(c.to_dict())
        assert c2.rl.enabled is True

    def test_roundtrip_preserves_trainable_parameters(self):
        c = load_config(pde_type="heat")
        c.pde.trainable_parameters = ["alpha"]
        c.pde.parameter_initial_guesses = {"alpha": 0.4}
        c2 = Config.from_snapshot(c.to_dict())
        assert c2.pde.trainable_parameters == ["alpha"]
        assert c2.pde.parameter_initial_guesses["alpha"] == 0.4

    def test_roundtrip_is_idempotent(self):
        c = load_config(pde_type="burgers", architecture="fourier")
        d1 = c.to_dict()
        d2 = Config.from_snapshot(d1).to_dict()
        assert d1 == d2
