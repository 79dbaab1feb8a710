"""Inverse-problem tests (analog of reference tests/unit_tests/
test_inverse_heat.py:93-142): coefficient registration, synthetic targets,
positive data loss, per-epoch trajectory, and directional convergence."""

import jax
import numpy as np

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer
from tests.test_utils import tiny_config


def make_inverse_cfg(**overrides):
    cfg = tiny_config(pde_type="heat", mode="inverse", **overrides)
    cfg.pde.trainable_parameters = ["alpha"]
    cfg.pde.parameter_initial_guesses = {"alpha": 0.5}
    return cfg


def test_alpha_error_decreases():
    """|alpha - truth| strictly decreases over 20 epochs
    (reference gate: test_inverse_heat.py:130-142)."""
    cfg = make_inverse_cfg(num_epochs=20, validation_frequency=5)
    cfg.training.optimizer_config.learning_rate = 0.01
    pde = create_pde(cfg)
    pde.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=128, noise=0.0)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    trainer.train()
    traj = trainer.history["param_alpha"]
    assert len(traj) == 20
    truth = 0.01
    err_start = abs(traj[0] - truth)
    err_end = abs(traj[-1] - truth)
    assert err_end < err_start, f"alpha error did not decrease: {err_start} -> {err_end}"


def test_data_loss_positive_in_inverse():
    cfg = make_inverse_cfg()
    pde = create_pde(cfg)
    pde.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=64, noise=0.01)
    model = PINNModel(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 16)
    losses = pde.compute_loss(model.apply, model.params, x, t, key=key)
    assert float(losses["data"]) > 0


def test_identified_parameters_in_result():
    cfg = make_inverse_cfg(num_epochs=2)
    pde = create_pde(cfg)
    pde.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=64)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    res = trainer.train()
    assert "alpha" in res["identified_parameters"]
    assert res["true_parameters"] == {"alpha": 0.01}


def test_noise_applied_to_observations():
    cfg = make_inverse_cfg()
    pde1 = create_pde(cfg)
    pde1.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=64, noise=0.0)
    pde2 = create_pde(cfg)
    pde2.generate_synthetic_observations(jax.random.PRNGKey(0), num_points=64, noise=0.1)
    assert not np.allclose(np.asarray(pde1.observations[2]), np.asarray(pde2.observations[2]))
