"""Semi-implicit Fourier-spectral phase-field solvers (TPU-native).

Reference solutions for TIME-DEPENDENT Allen-Cahn / Cahn-Hilliard dynamics —
the reference repo has no phase-field solver at all (its FDM module covers
heat/wave only, reference: pinnrl/benchmarks/fdm.py), and its CH/AC "exact"
targets are stationary. These solvers produce genuinely evolving fields
(spinodal growth + coarsening) to benchmark the PINN against over the full
time window.

Scheme: periodic 1D, rfft pseudo-spectral in space, ETDRK4 in time
(Kassam & Trefethen 2005, "Fourth-order time-stepping for stiff PDEs") —
the stiff linear operator is integrated EXACTLY via exponential time
differencing and the nonlinearity with a 4th-order RK rule, so dt ~ 1e-3
reaches reference accuracy where first-order IMEX needs dt ~ 1e-7:

    CH:  u_t = (u^3 - u - eps^2 u_xx)_xx    L = -eps^2 k^4,  N = -k^2 F[u^3 - u]
    AC:  u_t = eps^2 u_xx + u - u^3         L = -eps^2 k^2,  N = F[u - u^3]

The phi-function weights are precomputed on the host in f64 via the
contour-integral trick (mean over a unit circle around h L — numerically
stable near L = 0), then the stepping itself is jnp + lax.scan: the whole
trajectory compiles to one XLA program and runs on the TPU. Convergence is
verified by dt refinement in tests/test_spectral.py; CH conserves mass to
round-off by construction (the k=0 mode has L=0, N=0).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SpectralResult:
    """Trajectory on the solver grid: U[n_save+1, nx] at times t_save."""

    x: np.ndarray  # (nx,)
    t: np.ndarray  # (n_save+1,)
    u: np.ndarray  # (n_save+1, nx)
    kind: str
    eps: float


def solve_phase_field_1d(
    kind: str,
    u0: Callable[[jnp.ndarray], jnp.ndarray] | jnp.ndarray,
    eps: float,
    t_end: float,
    x_min: float = 0.0,
    x_max: float = 2.0 * np.pi,
    nx: int = 256,
    dt: float = 1e-4,
    n_save: int = 100,
) -> SpectralResult:
    """Integrate AC/CH on a periodic 1D grid; returns n_save+1 snapshots."""
    if kind not in ("allen_cahn", "cahn_hilliard"):
        raise ValueError(f"kind must be allen_cahn|cahn_hilliard, got {kind!r}")
    L = x_max - x_min
    x = x_min + L * jnp.arange(nx) / nx
    k = 2.0 * jnp.pi / L * jnp.fft.rfftfreq(nx, d=1.0 / nx)
    k2 = k * k

    steps_total = int(round(t_end / dt))
    steps_per_save = max(steps_total // n_save, 1)
    steps_total = steps_per_save * n_save
    dt = t_end / steps_total

    # Host-side f64 precompute of the ETDRK4 coefficients. The phi-function
    # expressions (e^z - 1)/z etc. are catastrophically cancellative near
    # z = 0 (the k = 0 mode has L = 0 exactly); the contour-integral mean
    # over a unit circle centered at each z evaluates them stably.
    k2_h = np.asarray(k2, dtype=np.float64)
    if kind == "cahn_hilliard":
        L_h = -(eps**2) * k2_h * k2_h

        def nonlinear(u):
            return -k2 * jnp.fft.rfft(u**3 - u)

    else:
        L_h = -(eps**2) * k2_h

        def nonlinear(u):
            return jnp.fft.rfft(u - u**3)

    z = dt * L_h
    E_h = np.exp(z)
    E2_h = np.exp(z / 2.0)
    M = 32
    r = np.exp(1j * np.pi * (np.arange(1, M + 1) - 0.5) / M)  # unit circle
    LR = z[:, None] + r[None, :]
    Q_h = dt * np.real(np.mean((np.exp(LR / 2.0) - 1.0) / LR, axis=1))
    f1_h = dt * np.real(
        np.mean((-4.0 - LR + np.exp(LR) * (4.0 - 3.0 * LR + LR**2)) / LR**3, axis=1)
    )
    f2_h = dt * np.real(
        np.mean((2.0 + LR + np.exp(LR) * (-2.0 + LR)) / LR**3, axis=1)
    )
    f3_h = dt * np.real(
        np.mean((-4.0 - 3.0 * LR - LR**2 + np.exp(LR) * (4.0 - LR)) / LR**3, axis=1)
    )
    E, E2, Q, f1, f2, f3 = (
        jnp.asarray(a, jnp.float32) for a in (E_h, E2_h, Q_h, f1_h, f2_h, f3_h)
    )

    def step(u_hat, _):
        u = jnp.fft.irfft(u_hat, n=nx)
        Nu = nonlinear(u)
        a = E2 * u_hat + Q * Nu
        Na = nonlinear(jnp.fft.irfft(a, n=nx))
        b = E2 * u_hat + Q * Na
        Nb = nonlinear(jnp.fft.irfft(b, n=nx))
        c = E2 * a + Q * (2.0 * Nb - Nu)
        Nc = nonlinear(jnp.fft.irfft(c, n=nx))
        u_next = E * u_hat + Nu * f1 + 2.0 * (Na + Nb) * f2 + Nc * f3
        return u_next, None

    u_init = u0(x) if callable(u0) else jnp.asarray(u0)
    if u_init.shape != (nx,):
        raise ValueError(f"u0 must produce shape ({nx},), got {u_init.shape}")

    @jax.jit
    def advance(u_hat):
        return jax.lax.scan(step, u_hat, None, length=steps_per_save)[0]

    u_hat = jnp.fft.rfft(u_init)
    snaps = [u_init]
    for _ in range(n_save):
        u_hat = advance(u_hat)
        snaps.append(jnp.fft.irfft(u_hat, n=nx))
    u_all = np.asarray(jnp.stack(snaps))
    t_save = np.linspace(0.0, t_end, n_save + 1)
    return SpectralResult(
        x=np.asarray(x), t=t_save, u=u_all, kind=kind, eps=float(eps)
    )


def interp_trajectory(
    res_u: jnp.ndarray,
    x_query: jnp.ndarray,
    t_query: jnp.ndarray,
    x_min: float,
    x_max: float,
    t_end: float,
) -> jnp.ndarray:
    """Bilinear interpolation into a (n_t, nx) PERIODIC trajectory — jittable,
    so PINN validation/BC/IC targets can read the spectral reference inside
    jit. ``x_query``/``t_query`` are (n, 1) columns; returns (n, 1)."""
    u = jnp.asarray(res_u)
    n_t, nx = u.shape
    L = x_max - x_min
    # Periodic fractional index in x (grid spacing L/nx, node nx wraps to 0).
    fx = (x_query[:, 0] - x_min) / L * nx
    ix0 = jnp.floor(fx).astype(jnp.int32)
    wx = fx - ix0
    ix0 = jnp.mod(ix0, nx)
    ix1 = jnp.mod(ix0 + 1, nx)
    # Clamped fractional index in t.
    ft = jnp.clip(t_query[:, 0] / t_end, 0.0, 1.0) * (n_t - 1)
    it0 = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, n_t - 2)
    wt = ft - it0
    it1 = it0 + 1

    v00 = u[it0, ix0]
    v01 = u[it0, ix1]
    v10 = u[it1, ix0]
    v11 = u[it1, ix1]
    v0 = v00 * (1 - wx) + v01 * wx
    v1 = v10 * (1 - wx) + v11 * wx
    return (v0 * (1 - wt) + v1 * wt).reshape(-1, 1)


def spinodal_ic(
    modes=((1, 0.05), (2, 0.04), (3, 0.03)),
    phase: float = 0.0,
    x_min: float = 0.0,
    x_max: float = 2.0 * np.pi,
):
    """Few-mode cosine perturbation around u=0 — the classic spinodal-
    decomposition IC: modes inside the unstable band grow, saturate at +-1,
    then coarsen. Modes are periodic on [x_min, x_max)."""

    L = x_max - x_min

    def u0(x):
        u = jnp.zeros_like(x)
        for n_mode, amp in modes:
            u = u + amp * jnp.cos(n_mode * 2.0 * jnp.pi * (x - x_min) / L + phase)
        return u

    return u0


def build_phase_field_reference(kind: str, settings, eps: float) -> SpectralResult:
    """Materialize the spectral reference a PDE's ``exact_solution.type:
    spectral`` block describes. Called eagerly from the PDE constructor (the
    trajectory must NOT be built inside a jit trace — it would be inlined
    and recomputed per loss evaluation)."""
    spec = settings.exact_solution or {}
    if settings.dimension != 1:
        raise ValueError("spectral phase-field reference supports 1D only")
    x_min, x_max = settings.domain[0]
    # Semantics for nonzero time_domain[0] (advisor round-3 finding made
    # precise in round 4): the configured ``ic_modes`` define the field at
    # ABSOLUTE t = 0, the solver integrates [0, time_domain[1]], and
    # ``interp_trajectory`` maps ABSOLUTE t/t_end into it. A window config
    # [t_k, t_hi] (time-marching) therefore gets the true global reference
    # restricted to its window — never a time-shifted one.
    t_end = float(settings.time_domain[1])
    modes = tuple(
        (int(n), float(a))
        for n, a in spec.get("ic_modes", ((1, 0.05), (2, 0.04), (3, 0.03)))
    )
    return solve_phase_field_1d(
        kind,
        spinodal_ic(modes, phase=float(spec.get("ic_phase", 0.0)),
                    x_min=x_min, x_max=x_max),
        eps=eps,
        t_end=t_end,
        x_min=x_min,
        x_max=x_max,
        nx=int(spec.get("nx", 256)),
        dt=float(spec.get("dt", 1e-3)),
        n_save=int(spec.get("n_save", 128)),
    )
