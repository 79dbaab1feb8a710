"""Benchmark-grade exact-solution variants: residual-zero checks.

The reference ships three "exact" solutions that do not satisfy their own
residuals (Allen-Cahn tanh(x/2eps), Black-Scholes calendar-time + erf,
pendulum small-angle vs sin) — each PDE documents the measurement. These
tests pin the opt-in genuine variants to near-machine-precision residuals
so the convergence benchmark targets are meaningful.
"""

import jax
import jax.numpy as jnp
import pytest

from pinnrl_tpu.config import load_config
from pinnrl_tpu.pdes import create_pde


def _residual_rms_of_exact(pde, x_rng, t_rng, n=100):
    x = jax.random.uniform(
        jax.random.PRNGKey(0), (n, 1), minval=x_rng[0], maxval=x_rng[1]
    )
    t = jax.random.uniform(
        jax.random.PRNGKey(1), (n, 1), minval=t_rng[0], maxval=t_rng[1]
    )

    def u(z):
        return pde.exact_solution(z[0:1].reshape(1, 1), z[1:2].reshape(1, 1))[0, 0]

    z = jnp.concatenate([x, t], axis=-1)
    r = jax.vmap(lambda zz: pde.residual_pointwise(u, zz, None))(z)
    return float(jnp.sqrt(jnp.mean(r**2)))


def test_allen_cahn_stationary_interface_is_exact():
    cfg = load_config(pde_type="allen_cahn", architecture="feedforward")
    cfg.pde.exact_solution = {"type": "stationary_interface"}
    pde = create_pde(cfg)
    assert _residual_rms_of_exact(pde, (-1, 1), (0, 1)) < 1e-4  # f32 jet noise

    # ... while the reference-parity default carries an O(0.1) residual.
    cfg2 = load_config(pde_type="allen_cahn", architecture="feedforward")
    pde2 = create_pde(cfg2)
    assert _residual_rms_of_exact(pde2, (-1, 1), (0, 1)) > 1e-2


def test_allen_cahn_stationary_ic_matches_exact():
    cfg = load_config(pde_type="allen_cahn", architecture="feedforward")
    cfg.pde.exact_solution = {"type": "stationary_interface"}
    cfg.pde.initial_condition = {"type": "stationary_interface"}
    pde = create_pde(cfg)
    ic = pde._create_initial_condition(cfg.pde.initial_condition)
    x = jnp.linspace(-1, 1, 17).reshape(-1, 1)
    t0 = jnp.zeros((17, 1))
    assert jnp.allclose(ic(x, t0), pde.exact_solution(x, t0), atol=1e-6)


def test_black_scholes_to_maturity_cdf_is_exact():
    cfg = load_config(pde_type="black_scholes", architecture="feedforward")
    cfg.pde.parameters["time_convention"] = "to_maturity"
    cfg.pde.exact_solution = {"type": "black_scholes", "strike": 100.0, "cdf": True}
    pde = create_pde(cfg)
    # V ~ O(100): compare against the calendar-time default's O(10) rms.
    assert _residual_rms_of_exact(pde, (10, 190), (0.05, 1.0)) < 0.05

    cfg2 = load_config(pde_type="black_scholes", architecture="feedforward")
    cfg2.pde.exact_solution = {"type": "black_scholes", "strike": 100.0, "cdf": True}
    pde2 = create_pde(cfg2)
    assert _residual_rms_of_exact(pde2, (10, 190), (0.05, 1.0)) > 1.0


def test_black_scholes_cdf_spec_key_changes_price():
    cfg = load_config(pde_type="black_scholes", architecture="feedforward")
    pde = create_pde(cfg)
    x = jnp.array([[100.0]])
    t = jnp.array([[0.5]])
    erf_price = pde.exact_solution(x, t)
    cdf_price = pde.exact_solution(x, t, use_cdf=True)
    cfg2 = load_config(pde_type="black_scholes", architecture="feedforward")
    cfg2.pde.exact_solution = {"type": "black_scholes", "strike": 100.0, "cdf": True}
    spec_price = create_pde(cfg2).exact_solution(x, t)
    assert jnp.allclose(spec_price, cdf_price)
    assert not jnp.allclose(spec_price, erf_price)


def test_pendulum_linearized_small_angle_is_exact():
    cfg = load_config(pde_type="pendulum", architecture="feedforward")
    cfg.pde.parameters["linearized"] = True
    pde = create_pde(cfg)
    assert _residual_rms_of_exact(pde, (0, 3.14), (0, 10)) < 1e-2  # f32, omega^2~9.81

    cfg2 = load_config(pde_type="pendulum", architecture="feedforward")
    pde2 = create_pde(cfg2)
    assert _residual_rms_of_exact(pde2, (0, 3.14), (0, 10)) > 0.05


@pytest.mark.parametrize(
    "key", ["convection", "allen_cahn", "black_scholes", "pendulum"]
)
def test_new_convergence_recipes_build_and_train(key):
    from pinnrl_tpu.benchmarks.convergence import build_recipe_config
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.training import PDETrainer

    cfg = build_recipe_config(key, epochs=1)
    cfg.model.hidden_dims = [8, 8]
    cfg.model.arch_params["mapping_size"] = 4
    t = cfg.training
    t.num_collocation_points = 32
    t.batch_size = 16
    t.num_boundary_points = 8
    t.num_initial_points = 8
    t.optimizer = "adam"
    pde = create_pde(cfg)
    m = PINNModel(cfg, seed=0)
    r = PDETrainer(m, pde, cfg).train(seed=0)
    assert r["status"] == "completed"
    assert jnp.isfinite(r["final_train_loss"])
