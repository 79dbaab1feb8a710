"""Special functions implemented TPU-natively (jittable, differentiable).

Jacobi elliptic functions via the descending Landen / AGM transformation
(Abramowitz & Stegun 16.4). A fixed, unrolled iteration count keeps the
computation jit-compatible (no data-dependent control flow); convergence is
quadratic, so ``_N_LANDEN=6`` gives c_6 < 1e-12 for any m = k^2 <= 0.95.
Beyond m ~ 0.95 (pendulum amplitudes approaching pi) accuracy degrades:
each extra Landen level doubles the seed phase and amplifies f32 rounding,
so the level count trades tail-m coverage against f32 noise — see the
comment at ``_N_LANDEN`` below. Callers needing m > 0.95 should switch to
f64 or clamp.

Used by the nonlinear-pendulum exact solution
theta(t) = 2 arcsin(k cd(omega t, k)) — the exact large-amplitude solution
the reference never benchmarks against (its pendulum "exact" is the
small-angle cosine, reference: pendulum_equation.py:158-212).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Quadratic convergence: c_6 < 1e-12 for any m <= 0.95, and every extra
# level DOUBLES the seed phase phi_N = 2^N a_N u, amplifying f32 rounding —
# 6 levels + period reduction keeps the f32 error ~1e-5.
_N_LANDEN = 6


def ellipk(m) -> jnp.ndarray:
    """Complete elliptic integral of the first kind K(m), m = k^2, via AGM."""
    m = jnp.asarray(m)
    a = jnp.ones_like(m)
    b = jnp.sqrt(1.0 - m)
    for _ in range(_N_LANDEN):
        a, b = (a + b) / 2.0, jnp.sqrt(a * b)
    return jnp.pi / (2.0 * a)


def ellipj(u, m) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jacobi elliptic sn(u|m), cn(u|m), dn(u|m), m = k^2 in [0, 1).

    Descending Landen (A&S 16.4.2-16.4.4): build the AGM ladder
    a_{n+1} = (a_n + b_n)/2, b_{n+1} = sqrt(a_n b_n), c_{n+1} = (a_n - b_n)/2,
    seed phi_N = 2^N a_N u, then back-recur
    phi_{n-1} = (phi_n + arcsin((c_n / a_n) sin phi_n)) / 2.
    Then sn = sin phi_0, cn = cos phi_0, dn = cos phi_0 / cos(phi_1 - phi_0).

    Matches scipy.special.ellipj to ~1e-7 in f32 (tests/test_special.py).
    """
    u = jnp.asarray(u)
    m = jnp.asarray(m)
    # Reduce into one period: sn/cn have period 4K (dn has 2K). Bounding
    # |u| <= 2K keeps the seed phase small — without this, f32 loses ~1e-3
    # of phase at |u| ~ 10.
    period = 4.0 * ellipk(m)
    u = u - period * jnp.round(u / period)
    a = jnp.ones_like(m)
    b = jnp.sqrt(1.0 - m)
    c = jnp.sqrt(m)
    # Ladder levels 1..N (coefficients AFTER each Landen step): the
    # back-recursion phi_n -> phi_{n-1} uses (a_n, c_n) at level n.
    ladder = []
    for _ in range(_N_LANDEN):
        a, b, c = (a + b) / 2.0, jnp.sqrt(a * b), (a - b) / 2.0
        ladder.append((a, c))
    phi = (2.0**_N_LANDEN) * a * u  # phi_N
    phi_1 = phi
    for a_n, c_n in reversed(ladder):  # n = N, N-1, ..., 1
        phi_1 = phi  # on the final pass this holds phi_1
        phi = (phi + jnp.arcsin(jnp.clip(c_n / a_n * jnp.sin(phi), -1.0, 1.0))) / 2.0
    sn = jnp.sin(phi)
    cn = jnp.cos(phi)
    dn = cn / jnp.cos(phi_1 - phi)
    # m = 0 degenerates to circular functions with dn = 1 exactly.
    dn = jnp.where(m == 0.0, jnp.ones_like(dn), dn)
    return sn, cn, dn


def pendulum_theta(t, theta0, omega):
    """Exact large-amplitude pendulum released from rest at ``theta0``.

    theta'' + omega^2 sin(theta) = 0, theta(0) = theta0, theta'(0) = 0
    =>  theta(t) = 2 arcsin(k cd(omega t | m)),  k = sin(theta0 / 2), m = k^2
    (cd = cn/dn; at t=0 cd=1 so theta=theta0, and d(cd)/dt|_0 = 0).
    Reduces to theta0 cos(omega t) as theta0 -> 0.
    """
    k = jnp.sin(theta0 / 2.0)
    m = k * k
    sn, cn, dn = ellipj(omega * t, m)
    return 2.0 * jnp.arcsin(jnp.clip(k * cn / dn, -1.0, 1.0))
