"""Shared test helpers (analog of reference tests/unit_tests/test_utils.py:19-116)."""

from __future__ import annotations

from pinnrl_tpu.config import load_config


def tiny_config(pde_type="heat", architecture="feedforward", **training_overrides):
    """2-epoch, 16-wide, 32-point config for smoke training
    (mirrors the reference's tiny-config pattern, test_trainer.py:28-119)."""
    cfg = load_config(pde_type=pde_type, architecture=architecture)
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params.setdefault("mapping_size", 8)
    cfg.model.arch_params["hidden_dim"] = 16
    cfg.model.arch_params["num_blocks"] = 2
    cfg.model.arch_params["num_layers"] = 2
    cfg.model.arch_params["modes"] = 4
    cfg.model.arch_params["latent_dim"] = 8
    t = cfg.training
    t.num_epochs = 2
    t.batch_size = 32
    t.num_collocation_points = 64
    t.num_boundary_points = 32
    t.num_initial_points = 32
    t.validation_frequency = 1
    for k, v in training_overrides.items():
        setattr(t, k, v)
    return cfg
