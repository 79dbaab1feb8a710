"""ETDRK4 spectral phase-field solvers (numerical_solvers/spectral.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.numerical_solvers.spectral import (
    build_phase_field_reference,
    interp_trajectory,
    solve_phase_field_1d,
    spinodal_ic,
)


def _small(kind, dt=2e-3, nx=64, t_end=1.0, eps=0.5, n_save=20):
    return solve_phase_field_1d(
        kind, spinodal_ic(((1, 0.1), (2, 0.05))), eps=eps, t_end=t_end,
        nx=nx, dt=dt, n_save=n_save,
    )


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="kind"):
        solve_phase_field_1d("kdv", spinodal_ic(), 0.1, 1.0)


def test_shapes_and_times():
    res = _small("allen_cahn")
    assert res.u.shape == (21, 64)
    assert res.t[0] == 0.0 and res.t[-1] == pytest.approx(1.0)
    assert np.isfinite(res.u).all()


def test_allen_cahn_spinodal_grows():
    """Unstable modes grow: amplitude increases from the 0.1 perturbation."""
    res = _small("allen_cahn", t_end=8.0, n_save=40)
    assert np.abs(res.u[0]).max() < 0.2
    assert np.abs(res.u[-1]).max() > 0.8  # saturated domains
    assert np.abs(res.u[-1]).max() <= 1.01


def test_cahn_hilliard_conserves_mass():
    res = _small("cahn_hilliard", dt=5e-4, nx=128, t_end=2.0, eps=0.18)
    assert abs(res.u[-1].mean() - res.u[0].mean()) < 1e-6


def test_allen_cahn_energy_decreases():
    """Ginzburg-Landau energy is a Lyapunov functional for AC flow."""
    res = _small("allen_cahn", t_end=4.0, n_save=8)
    L = 2 * np.pi
    dx = L / res.u.shape[1]

    def energy(u):
        ux = np.gradient(u, dx, edge_order=2)
        return np.sum(0.5 * 0.5**2 * ux**2 + 0.25 * (u**2 - 1) ** 2) * dx

    es = [energy(u) for u in res.u]
    assert all(b <= a + 1e-5 for a, b in zip(es, es[1:]))


def test_etdrk4_dt_refinement():
    """4th-order stepping: halving dt changes the answer by < 1e-4 (f32)."""
    a = _small("cahn_hilliard", dt=1e-3, nx=128, t_end=2.0, eps=0.18)
    b = _small("cahn_hilliard", dt=5e-4, nx=128, t_end=2.0, eps=0.18)
    assert np.abs(a.u - b.u).max() < 5e-4


def test_interp_trajectory_nodes_and_periodic_wrap():
    res = _small("allen_cahn")
    u = jnp.asarray(res.u)
    xq = jnp.array([[float(res.x[3])], [float(res.x[0]) + 2 * np.pi]])
    tq = jnp.array([[0.0], [0.0]])
    v = interp_trajectory(u, xq, tq, 0.0, 2 * np.pi, 1.0)
    assert float(v[0, 0]) == pytest.approx(float(res.u[0, 3]), abs=1e-6)
    assert float(v[1, 0]) == pytest.approx(float(res.u[0, 0]), abs=1e-5)


def test_interp_trajectory_time_lerp():
    res = _small("allen_cahn")
    u = jnp.asarray(res.u)
    mid_t = 0.5 * (res.t[4] + res.t[5])
    v = interp_trajectory(
        u, jnp.array([[float(res.x[7])]]), jnp.array([[float(mid_t)]]),
        0.0, 2 * np.pi, 1.0,
    )
    expected = 0.5 * (res.u[4, 7] + res.u[5, 7])
    assert float(v[0, 0]) == pytest.approx(float(expected), abs=1e-6)


def test_build_reference_from_settings():
    from pinnrl_tpu.config import load_config

    cfg = load_config(pde_type="allen_cahn")
    cfg.pde.domain = [[0.0, 2 * np.pi]]
    cfg.pde.time_domain = [0.0, 1.0]
    cfg.pde.exact_solution = {"type": "spectral", "nx": 64, "dt": 2e-3, "n_save": 10}
    res = build_phase_field_reference("allen_cahn", cfg.pde, 0.5)
    assert res.u.shape == (11, 64)


def test_pde_spectral_exact_and_ic():
    from pinnrl_tpu.benchmarks.convergence import build_recipe_config
    from pinnrl_tpu.pdes import create_pde

    cfg = build_recipe_config("allen_cahn_dynamics")
    cfg.pde.exact_solution.update({"nx": 64, "dt": 5e-3, "n_save": 16})
    pde = create_pde(cfg)
    x = jnp.linspace(0.0, 6.28, 9).reshape(-1, 1)
    u0 = pde.exact_solution(x, jnp.zeros((9, 1)))
    # t=0 trace equals the recipe's own spinodal IC
    modes = tuple(
        (int(n), float(a)) for n, a in cfg.pde.exact_solution["ic_modes"]
    )
    ic = spinodal_ic(modes)(x[:, 0]).reshape(-1, 1)
    # atol bounded by LINEAR x-interpolation of the cos modes on the
    # nx=64 test grid: h^2/8 * max|u''| ~ 2e-3.
    np.testing.assert_allclose(np.asarray(u0), np.asarray(ic), atol=2e-3)
    # late field is saturated (the dynamics actually happened)
    t_end = float(cfg.pde.time_domain[1])
    u_end = pde.exact_solution(x, jnp.full((9, 1), t_end))
    assert float(jnp.abs(u_end).max()) > 0.8
    # and the field genuinely evolved
    assert float(jnp.abs(u_end - u0).max()) > 0.2
