"""Pendulum ODE-as-PDE: theta_tt + (g/L) sin(theta) = 0
(reference: pinnrl/pdes/pendulum_equation.py). Extras: total energy and
phase-space trajectories (reference: pendulum_equation.py:158-212).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pinnrl_tpu.ops.derivatives import directional_derivative
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class PendulumEquation(PDEBase):
    pde_type = "pendulum"
    default_parameters = {"g": 9.81, "L": 1.0}
    spatial_orders = ()
    temporal_orders = (1, 2)

    def _g(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "g", default=9.81)

    def _L(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "L", default=1.0)

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        """theta_tt + (g/L) sin(theta) = 0 (reference: pendulum_equation.py).

        The ``small_angle`` exact solution ``theta0 cos(omega t)`` solves the
        LINEARIZED equation only — against the nonlinear residual it carries
        an O(theta0^3) model error (rms 0.12 at theta0=0.5, measured in
        f64). ``parameters.linearized: true`` swaps ``sin(theta) -> theta``
        so the small-angle benchmark target is genuinely exact.
        """
        u_tt = directional_derivative(u, z, self.dimension, 2)[1]
        val = u(z)
        restoring = (
            val if bool(self.parameters.get("linearized", False)) else jnp.sin(val)
        )
        return u_tt + (self._g(coeffs) / self._L(coeffs)) * restoring

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        if not self.settings.exact_solution:
            return None
        spec = self.settings.exact_solution
        sol_type = spec.get("type", "small_angle")
        if sol_type == "small_angle":
            theta0 = float(spec.get("initial_angle", 0.1))
            omega = jnp.sqrt(self._g(coeffs) / self._L(coeffs))
            return theta0 * jnp.cos(omega * t) * jnp.ones_like(x[:, 0:1])
        if sol_type == "sine":
            A = float(spec.get("amplitude", 1.0))
            f = float(spec.get("frequency", 1.0))
            return A * jnp.sin(f * (x[:, 0:1] + t))
        if sol_type == "elliptic":
            # Exact LARGE-amplitude solution (release from rest at theta0):
            # theta(t) = 2 arcsin(sin(theta0/2) cd(omega t | m)) via the
            # TPU-native Jacobi elliptic functions in ops/special.py —
            # benchmarks the true nonlinear residual, which the reference
            # never does (its "exact" is the small-angle cosine,
            # reference: pendulum_equation.py:158-212).
            from pinnrl_tpu.ops.special import pendulum_theta

            theta0 = float(spec.get("initial_angle", 0.5))
            omega = jnp.sqrt(self._g(coeffs) / self._L(coeffs))
            return pendulum_theta(t, theta0, omega) * jnp.ones_like(x[:, 0:1])
        raise ValueError(f"Unknown exact solution type: {sol_type!r}")

    def compute_loss(self, apply_fn, params, x, t, coeffs=None, key=None):
        """Adds the angular-velocity initial condition theta_t(t0) =
        d/dt theta_exact(t0). A 2nd-order-in-time ODE is underdetermined with
        a value-only IC: residual-zero solutions form A cos(w t) + B sin(w t)
        and leaving B free showed up as seed-dependent phase drift (rel-L2
        0.07-0.34 at train loss ~2e-4). Mirrors the wave equation's velocity
        IC (pdes/wave.py)."""
        losses = super().compute_loss(apply_fn, params, x, t, coeffs=coeffs, key=key)
        if not self.settings.exact_solution:
            return losses
        key = key if key is not None else jax.random.PRNGKey(0)
        _, n_i = self._bc_counts(x.shape[0])
        x_i, t_i = self._sample_initial_points(jax.random.fold_in(key, 0x1C), n_i)
        u = self._scalar_u(apply_fn, params)
        z_i = jnp.concatenate([x_i, t_i], axis=-1)
        u_t0 = jax.vmap(
            lambda zz: directional_derivative(u, zz, self.dimension, 1)[0]
        )(z_i).reshape(-1, 1)
        # d/dt of the configured exact solution at the initial time, by jvp
        # (small_angle: -theta0 * omega * sin(omega t0) = 0 at t0 = 0).
        target = jax.jvp(
            lambda tt: self.exact_solution(x_i, tt, coeffs),
            (t_i,), (jnp.ones_like(t_i),),
        )[1]
        velocity_ic = self._loss(u_t0 - target)
        losses["initial"] = losses["initial"] + velocity_ic
        lw = self._loss_weights()
        w_ic = float(lw.get("initial", 10.0))
        mode = self._training_mode()
        active = 0.0 if mode == "data_only" else 1.0
        losses["total"] = losses["total"] + active * w_ic * velocity_ic
        return losses

    def compute_energy(self, apply_fn, params, x, t, coeffs: Optional[Coeffs] = None):
        """Kinetic + potential energy (reference: pendulum_equation.py:158-189)."""
        u = self._scalar_u(apply_fn, params)
        z = jnp.concatenate([x, t], axis=-1)
        g, L = self._g(coeffs), self._L(coeffs)

        def point_energy(zz):
            theta = u(zz)
            theta_t = directional_derivative(u, zz, self.dimension, 1)[0]
            kinetic = 0.5 * L * L * theta_t**2
            potential = g * L * (1 - jnp.cos(theta))
            return kinetic + potential

        return jax.vmap(point_energy)(z).reshape(-1, 1)

    def compute_phase_space(
        self, apply_fn, params, x, t, coeffs: Optional[Coeffs] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """(theta, dtheta/dt) (reference: pendulum_equation.py:191-212)."""
        u = self._scalar_u(apply_fn, params)
        z = jnp.concatenate([x, t], axis=-1)
        theta = jax.vmap(u)(z).reshape(-1, 1)
        theta_t = jax.vmap(
            lambda zz: directional_derivative(u, zz, self.dimension, 1)[0]
        )(z).reshape(-1, 1)
        return theta, theta_t
