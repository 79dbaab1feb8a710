"""Finite-difference baselines for heat and wave equations.

Capability mirror of the reference FDM solvers (reference: pinnrl/benchmarks/
fdm.py:25-189) with a TPU-native twist: the time loop is a ``jax.lax.scan``
over the stencil update, so the whole solve is one compiled XLA program that
runs on TPU (the reference loops in Python over numpy arrays).

Stability guards match the reference exactly:
- heat: r = alpha*dt/dx^2 <= 0.5 (reference: fdm.py:91-95)
- wave: CFL c*dt/dx <= 1     (reference: fdm.py:158-163)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FDMResult:
    """Solution record (reference: fdm.py:25-47)."""

    x: np.ndarray  # (nx,)
    t: np.ndarray  # (nt,)
    u: np.ndarray  # (nt, nx)
    scheme: str
    stability: float  # r (heat) or CFL (wave)
    l2_error: Optional[float] = None  # vs analytic, when available

    def final_state(self) -> np.ndarray:
        return self.u[-1]


def _default_heat_ic(x: jnp.ndarray, L: float, amplitude: float = 1.0, k: float = 2.0):
    return amplitude * jnp.sin(2 * jnp.pi * k * x / L)


def solve_heat_1d(
    alpha: float = 0.01,
    x_min: float = 0.0,
    x_max: float = 2.0,
    nx: int = 51,
    t_max: float = 0.5,
    nt: int = 2001,
    ic: Optional[Callable] = None,
    amplitude: float = 1.0,
    frequency: float = 2.0,
) -> FDMResult:
    """Explicit-Euler heat solve with periodic roll stencil
    (reference: fdm.py:55-117)."""
    x = jnp.linspace(x_min, x_max, nx)
    dx = float(x[1] - x[0])
    dt = t_max / (nt - 1)
    r = alpha * dt / dx**2
    if r > 0.5:
        raise ValueError(
            f"Explicit heat scheme unstable: r={r:.4f} > 0.5 "
            f"(reduce dt or increase dx)"
        )
    L = x_max - x_min
    u0 = ic(x) if ic is not None else _default_heat_ic(x, L, amplitude, frequency)

    # Periodic stencil: x[0] and x[-1] are the same physical point on an
    # inclusive grid, so the roll wraps over the first nx-1 cells only.
    def step(v, _):
        lap = jnp.roll(v, -1) - 2 * v + jnp.roll(v, 1)
        v_new = v + r * lap
        return v_new, v_new

    v0 = u0[:-1]
    _, traj = jax.lax.scan(step, v0, None, length=nt - 1)
    v = jnp.concatenate([v0[None], traj], axis=0)
    u = jnp.concatenate([v, v[:, :1]], axis=1)  # duplicate the wrap point

    # Analytic comparison for the default sine IC.
    t_grid = jnp.linspace(0.0, t_max, nt)
    k_wave = 2 * jnp.pi * frequency / L
    exact = (
        amplitude
        * jnp.exp(-alpha * k_wave**2 * t_grid[:, None])
        * jnp.sin(k_wave * x[None, :])
    )
    l2 = float(jnp.sqrt(jnp.mean((u - exact) ** 2))) if ic is None else None
    return FDMResult(
        x=np.asarray(x), t=np.asarray(t_grid), u=np.asarray(u),
        scheme="explicit_euler_periodic", stability=float(r), l2_error=l2,
    )


def solve_wave_1d(
    c: float = 1.0,
    x_min: float = 0.0,
    x_max: float = 1.0,
    nx: int = 101,
    t_max: float = 0.5,
    nt: int = 2001,
    ic: Optional[Callable] = None,
) -> FDMResult:
    """Leap-frog wave solve with a Taylor first step and Dirichlet-0 ends
    (reference: fdm.py:125-189). Default IC matches the traveling-wave
    exact solution sin(2*pi*(x - c t))."""
    x = jnp.linspace(x_min, x_max, nx)
    dx = float(x[1] - x[0])
    dt = t_max / (nt - 1)
    cfl = c * dt / dx
    if cfl > 1.0:
        raise ValueError(f"Wave CFL violated: c*dt/dx={cfl:.4f} > 1")
    r2 = cfl**2

    if ic is None:
        u0 = jnp.sin(2 * jnp.pi * x)
        v0 = -2 * jnp.pi * c * jnp.cos(2 * jnp.pi * x)  # du/dt at t=0
    else:
        u0 = ic(x)
        v0 = jnp.zeros_like(u0)

    def lap(u):
        return jnp.concatenate(
            [jnp.zeros((1,)), u[2:] - 2 * u[1:-1] + u[:-2], jnp.zeros((1,))]
        )

    # Taylor first step: u1 = u0 + dt*v0 + 0.5*r2*lap(u0).
    u1 = u0 + dt * v0 + 0.5 * r2 * lap(u0)
    u1 = u1.at[0].set(jnp.sin(2 * jnp.pi * (x[0] - c * dt))).at[-1].set(
        jnp.sin(2 * jnp.pi * (x[-1] - c * dt))
    ) if ic is None else u1

    t_grid = jnp.linspace(0.0, t_max, nt)

    def step(carry, t_next):
        u_prev, u_curr = carry
        u_next = 2 * u_curr - u_prev + r2 * lap(u_curr)
        if ic is None:
            # Exact Dirichlet traces of the traveling wave at the ends.
            u_next = u_next.at[0].set(jnp.sin(2 * jnp.pi * (x[0] - c * t_next)))
            u_next = u_next.at[-1].set(jnp.sin(2 * jnp.pi * (x[-1] - c * t_next)))
        return (u_curr, u_next), u_next

    _, traj = jax.lax.scan(step, (u0, u1), t_grid[2:])
    u = jnp.concatenate([u0[None], u1[None], traj], axis=0)

    exact = jnp.sin(2 * jnp.pi * (x[None, :] - c * t_grid[:, None]))
    l2 = float(jnp.sqrt(jnp.mean((u - exact) ** 2))) if ic is None else None
    return FDMResult(
        x=np.asarray(x), t=np.asarray(t_grid), u=np.asarray(u),
        scheme="leapfrog_dirichlet", stability=float(cfl), l2_error=l2,
    )
