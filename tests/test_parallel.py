"""Mesh data-parallel tests on the 8-device virtual CPU mesh
(the reference has no distributed tests because it has no distributed code;
this is the fake-backend analog called for in SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.parallel import batch_sharding, make_mesh, shard_batch
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer
from tests.test_utils import tiny_config


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_sizes():
    mesh = make_mesh()
    assert mesh.size == 8
    mesh4 = make_mesh(4)
    assert mesh4.size == 4
    with pytest.raises(ValueError):
        make_mesh(100)


def test_shard_batch_layout():
    mesh = make_mesh()
    x = jnp.zeros((64, 2))

    @jax.jit
    def f(x):
        return shard_batch(mesh, x) * 2

    y = f(x)
    assert y.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)


def test_data_parallel_training_matches_single_device():
    """Same seed: 8-way sharded training must produce the same loss
    trajectory as unsharded (params replicated, grads psum'd by XLA)."""
    def run(mesh):
        cfg = tiny_config(num_epochs=3)
        pde = create_pde(cfg)
        model = PINNModel(cfg, seed=0)
        trainer = PDETrainer(model, pde, cfg, mesh=mesh)
        trainer.train(seed=0)
        return trainer.history["train_loss"]

    losses_sharded = run(make_mesh())
    losses_single = run(None)
    np.testing.assert_allclose(losses_sharded, losses_single, rtol=2e-3)


def test_data_parallel_batch_padding():
    cfg = tiny_config(num_epochs=1)
    cfg.training.batch_size = 30  # not divisible by 8 -> padded to 32
    cfg.training.num_collocation_points = 64
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg, mesh=make_mesh())
    res = trainer.train(seed=0)
    assert res["status"] == "completed"
