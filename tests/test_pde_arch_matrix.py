"""Cross-product matrix: every PDE x every architecture
(analog of reference tests/unit_tests/test_pde_arch_matrix.py:18-137 and
test_fno_all_pdes.py). Forward shape, finite outputs, loss keys, no NaN."""

import jax
import jax.numpy as jnp
import pytest

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from tests.test_utils import tiny_config

PDES = [
    "heat", "wave", "burgers", "kdv", "convection",
    "allen_cahn", "cahn_hilliard", "black_scholes", "pendulum",
]
ARCHS = ["feedforward", "resnet", "siren", "fourier", "fno", "attention", "autoencoder"]


@pytest.mark.parametrize("pde_type", PDES)
@pytest.mark.parametrize("arch", ARCHS)
def test_pde_arch_combo(pde_type, arch):
    cfg = tiny_config(pde_type=pde_type, architecture=arch)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    x, t = pde.generate_collocation_points(key, 8)

    # Forward: shape + finite.
    u = model.apply(model.params, jnp.concatenate([x, t], axis=-1))
    assert u.shape == (8, 1)
    assert bool(jnp.all(jnp.isfinite(u)))

    # Loss assembly: keys + finite total.
    losses = pde.compute_loss(model.apply, model.params, x, t, key=key)
    assert {"residual", "boundary", "initial", "smoothness", "gpinn",
            "data", "total"} == set(losses)
    assert bool(jnp.isfinite(losses["total"])), f"{pde_type}/{arch} total not finite"
