"""Heat equation u_t = alpha * lap(u) (reference: pinnrl/pdes/heat_equation.py).

Carries over the reference's behavioral details: decay rate tied to alpha via
``decay = alpha * (2*pi*f/L)^2`` (reference: heat_equation.py:41-52), a
``compute_loss`` override with true periodic BCs that match both values and
first derivatives at the endpoints (reference: heat_equation.py:420-445),
time-stratified boundary points (25% in the first 1% of time,
reference: heat_equation.py:406-418), finite-difference smoothness loss
(reference: heat_equation.py:625-650), and validation with NaN/physical-bound
checks (reference: heat_equation.py:296-373).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.ops.derivatives import directional_derivative, laplacian
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class HeatEquation(PDEBase):
    pde_type = "heat"
    default_parameters = {"alpha": 0.01}
    spatial_orders = (2,)
    temporal_orders = (1,)

    def _validate_parameters(self) -> None:
        if "alpha" not in self.parameters:
            raise ValueError("heat equation requires parameter 'alpha'")

    def _alpha(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "alpha")

    def _decay_rate(self, k: float, coeffs: Optional[Coeffs] = None):
        """decay = alpha * (2*pi*k/L)^2 (reference: heat_equation.py:41-52)."""
        L = self.domain[0][1] - self.domain[0][0]
        wave_number = 2 * jnp.pi * k / L
        return self._alpha(coeffs) * wave_number**2

    # ------------------------------------------------------------------ #

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        u_t = directional_derivative(u, z, self.dimension, 1)[0]
        lap = laplacian(u, z, range(self.dimension))
        return u_t - self._alpha(coeffs) * lap

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        spec = self.settings.exact_solution or self.settings.initial_condition or {}
        sol_type = spec.get("type", "sin_exp_decay")

        if sol_type == "sine_2d" and self.dimension == 2:
            # Domain-consistent wave numbers 2*pi*k/L per axis so the product
            # mode vanishes on the Dirichlet boundary AND solves the PDE.
            # (The reference uses k*pi regardless of L — on its [0, pi]^2
            # domain that is zero at neither boundary, making the benchmark
            # ill-posed; reference: heat_equation.py:163-175.)
            A = float(spec.get("amplitude", 1.0))
            kx = float(spec.get("frequency_x", 2.0))
            ky = float(spec.get("frequency_y", 2.0))
            wx = 2 * jnp.pi * kx / (self.domain[0][1] - self.domain[0][0])
            wy = 2 * jnp.pi * ky / (self.domain[1][1] - self.domain[1][0])
            decay = wx**2 + wy**2
            time_factor = jnp.exp(-self._alpha(coeffs) * decay * t)
            space = jnp.sin(wx * (x[:, 0:1] - self.domain[0][0])) * jnp.sin(
                wy * (x[:, 1:2] - self.domain[1][0])
            )
            return A * time_factor * space

        # sin_exp_decay / sine (reference: heat_equation.py:140-196)
        A = float(spec.get("amplitude", 1.0))
        k = float(spec.get("frequency", 2.0))
        decay = self._decay_rate(k, coeffs)
        if self.dimension == 1:
            L = self.domain[0][1] - self.domain[0][0]
            wave_number = 2 * jnp.pi * k / L
            return A * jnp.exp(-decay * t) * jnp.sin(wave_number * x[:, 0:1])
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            L = self.domain[dim][1] - self.domain[dim][0]
            wave_number = 2 * jnp.pi * k / L
            sol = sol * jnp.sin(wave_number * x[:, dim : dim + 1])
        return A * jnp.exp(-decay * t) * sol

    # ------------------------------------------------------------------ #
    # IC / BC overrides: exact-solution-aware targets
    # ------------------------------------------------------------------ #

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "sine")
        if ic_type == "sin_exp_decay":
            A = float(params.get("amplitude", 1.0))
            k = float(params.get("frequency", 2.0))

            def ic(x, t):
                decay = self._decay_rate(k, None)
                if self.dimension == 1:
                    L = self.domain[0][1] - self.domain[0][0]
                    wn = 2 * jnp.pi * k / L
                    return A * jnp.sin(wn * x[:, 0:1]) * jnp.exp(-decay * t)
                sol = jnp.ones_like(x[:, 0:1])
                for dim in range(self.dimension):
                    L = self.domain[dim][1] - self.domain[dim][0]
                    wn = 2 * jnp.pi * k / L
                    sol = sol * jnp.sin(wn * x[:, dim : dim + 1])
                return A * sol * jnp.exp(-decay * t)

            return ic
        if ic_type == "sine" and self.dimension == 1:
            A = float(params.get("amplitude", 1.0))
            k = float(params.get("frequency", 2.0))
            L = self.domain[0][1] - self.domain[0][0]
            wn = 2 * jnp.pi * k / L
            return lambda x, t: A * jnp.sin(wn * x[:, 0:1])
        if ic_type == "sine_2d":
            # Matches the (well-posed) sine_2d exact solution at t=0.
            A = float(params.get("amplitude", 1.0))
            kx = float(params.get("frequency_x", 2.0))
            ky = float(params.get("frequency_y", 2.0))
            wx = 2 * jnp.pi * kx / (self.domain[0][1] - self.domain[0][0])
            wy = 2 * jnp.pi * ky / (self.domain[1][1] - self.domain[1][0])
            return lambda x, t: (
                A
                * jnp.sin(wx * (x[:, 0:1] - self.domain[0][0]))
                * jnp.sin(wy * (x[:, 1:2] - self.domain[1][0]))
            )
        return super()._create_initial_condition(params)

    def _create_boundary_condition(self, bc_type: str, params: Dict) -> Callable:
        if (
            bc_type == "dirichlet"
            and (self.settings.exact_solution or {}).get("type") == "sin_exp_decay"
        ):
            A = float(self.settings.exact_solution.get("amplitude", 1.0))
            k = float(self.settings.exact_solution.get("frequency", 2.0))
            L = self.domain[0][1] - self.domain[0][0]
            wn = 2 * jnp.pi * k / L

            def bc(x, t):
                decay = self._decay_rate(k, None)
                return A * jnp.sin(wn * x[:, 0:1]) * jnp.exp(-decay * t)

            return bc
        return super()._create_boundary_condition(bc_type, params)

    # ------------------------------------------------------------------ #
    # Loss override: true periodic BCs + stratified time + FD smoothness
    # ------------------------------------------------------------------ #

    def _stratified_time(self, n: int) -> jnp.ndarray:
        """25% of boundary times in the first 1% of the horizon
        (reference: heat_equation.py:406-418)."""
        t_max = self.time_domain[1]
        t_early = t_max * 0.01
        n_early = max(n // 4, 1)
        n_late = n - n_early
        t = np.concatenate(
            [np.linspace(0.0, t_early, n_early), np.linspace(t_early, t_max, n_late)]
        ).astype(np.float32)
        return jnp.asarray(t).reshape(-1, 1)

    def compute_loss(self, apply_fn, params, x, t, coeffs=None, key=None):
        residual = self.compute_residual(apply_fn, params, x, t, coeffs)
        residual_loss = self._residual_loss(residual, t)

        n_colloc = x.shape[0]
        if self.training is not None:
            n_b = int(getattr(self.training, "num_boundary_points", n_colloc // 10))
            n_i = int(getattr(self.training, "num_initial_points", n_colloc // 5))
        else:
            n_b = max(n_colloc // 10, 10)
            n_i = max(n_colloc // 5, 10)

        u_scalar = self._scalar_u(apply_fn, params)
        t_b = self._stratified_time(n_b)
        boundary_loss = jnp.zeros(())

        if "periodic" in self.boundary_conditions or (
            self.settings.boundary_conditions or {}
        ).get("periodic") is not None:
            if self.dimension == 1:
                # Value + first-derivative match at the endpoints
                # (reference: heat_equation.py:420-445).
                x_lo, x_hi = self.domain[0]
                z_lo = jnp.concatenate([jnp.full_like(t_b, x_lo), t_b], axis=1)
                z_hi = jnp.concatenate([jnp.full_like(t_b, x_hi), t_b], axis=1)
                u_lo = jax.vmap(u_scalar)(z_lo)
                u_hi = jax.vmap(u_scalar)(z_hi)
                du_lo = jax.vmap(lambda zz: directional_derivative(u_scalar, zz, 0, 1)[0])(z_lo)
                du_hi = jax.vmap(lambda zz: directional_derivative(u_scalar, zz, 0, 1)[0])(z_hi)
                boundary_loss = boundary_loss + self._loss(u_lo - u_hi)
                boundary_loss = boundary_loss + self._loss(du_lo - du_hi)
            else:
                # Per-axis value periodicity with random free coords
                # (reference: heat_equation.py:446-473).
                key = key if key is not None else jax.random.PRNGKey(0)
                per_axis = max(n_b // (2 * self.dimension), 1)
                for axis in range(self.dimension):
                    key, k_free, k_t = jax.random.split(key, 3)
                    los = jnp.array([lo for lo, _ in self.domain])
                    his = jnp.array([hi for _, hi in self.domain])
                    free = jax.random.uniform(
                        k_free, (per_axis, self.dimension), minval=los, maxval=his
                    )
                    t_axis = jax.random.uniform(
                        k_t,
                        (per_axis, 1),
                        minval=self.time_domain[0],
                        maxval=self.time_domain[1],
                    )
                    lo_ax, hi_ax = self.domain[axis]
                    c_min = free.at[:, axis].set(lo_ax)
                    c_max = free.at[:, axis].set(hi_ax)
                    u_min = jax.vmap(u_scalar)(jnp.concatenate([c_min, t_axis], axis=1))
                    u_max = jax.vmap(u_scalar)(jnp.concatenate([c_max, t_axis], axis=1))
                    boundary_loss = boundary_loss + self._loss(u_min - u_max)
        else:
            # Dirichlet via registered target closures on the static skeleton,
            # sized from num_boundary_points across the 2*dim faces.
            x_b, t_bb = self._boundary_skeleton(
                n_time=max(n_b // (2 * self.dimension), 100)
            )
            for bc_type, bc_func in self.boundary_conditions.items():
                if bc_type == "initial":
                    continue
                u_b = apply_fn(params, jnp.concatenate([x_b, t_bb], axis=-1)).reshape(
                    x_b.shape[0], -1
                )[:, 0:1]
                boundary_loss = boundary_loss + self._loss(u_b - bc_func(x_b, t_bb))

        # Initial condition: boundary-concentrated 1D layout
        # (reference: heat_equation.py:488-535 — 25% near each edge, 50% interior).
        if self.dimension == 1:
            x_min, x_max = self.domain[0]
            edge = (x_max - x_min) * 0.1
            n_q = max(n_i // 4, 1)
            n_h = max(n_i // 2, 1)
            x_i = np.concatenate(
                [
                    np.linspace(x_min, x_min + edge, n_q),
                    np.linspace(x_min + edge, x_max - edge, n_h),
                    np.linspace(x_max - edge, x_max, n_q),
                ]
            ).astype(np.float32).reshape(-1, 1)
            x_i = jnp.asarray(x_i)
        else:
            key = key if key is not None else jax.random.PRNGKey(1)
            key, k_i = jax.random.split(key)
            los = jnp.array([lo for lo, _ in self.domain])
            his = jnp.array([hi for _, hi in self.domain])
            x_i = jax.random.uniform(k_i, (n_i, self.dimension), minval=los, maxval=his)
        t_i = jnp.zeros((x_i.shape[0], 1))
        u_i = apply_fn(params, jnp.concatenate([x_i, t_i], axis=-1)).reshape(
            x_i.shape[0], -1
        )[:, 0:1]
        ic_fn = self.boundary_conditions.get("initial")
        target = ic_fn(x_i, t_i) if ic_fn is not None else jnp.zeros_like(u_i)
        initial_loss = self._loss(u_i - target)

        # FD smoothness regularizer (reference: heat_equation.py:625-650),
        # active only when weighted.
        smoothness_loss = jnp.zeros(())
        if float(self._loss_weights().get("smoothness", 0.0)) > 0:
            smoothness_loss = self._fd_smoothness(apply_fn, params, x, t)

        data_loss = self._compute_data_loss(apply_fn, params)
        return self._assemble_total(
            residual_loss, boundary_loss, initial_loss, smoothness_loss, data_loss
        )

    def _fd_smoothness(self, apply_fn, params, x, t):
        eps = 1e-4
        u_fn = lambda xx: apply_fn(params, jnp.concatenate([xx, t], axis=-1)).reshape(
            xx.shape[0], -1
        )[:, 0:1]
        u_c = u_fn(x)
        loss = jnp.zeros(())
        for d in range(self.dimension):
            lo, hi = self.domain[d]
            x_p = x.at[:, d].set(jnp.clip(x[:, d] + eps, lo, hi))
            x_m = x.at[:, d].set(jnp.clip(x[:, d] - eps, lo, hi))
            du_f = (u_fn(x_p) - u_c) / eps
            du_b = (u_c - u_fn(x_m)) / eps
            loss = loss + jnp.mean(jnp.abs(du_f)) + jnp.mean(jnp.abs(du_b))
        return loss

    # ------------------------------------------------------------------ #

    def validate(self, apply_fn, params, coeffs=None, key=None, num_points=1000):
        """Adds NaN/Inf, physical-bound, and periodic-BC checks
        (reference: heat_equation.py:296-373)."""
        metrics = super().validate(apply_fn, params, coeffs, key, num_points)
        key = key if key is not None else jax.random.PRNGKey(0)
        from pinnrl_tpu.sampling import sample_uniform

        x, t = sample_uniform(key, num_points, self.domain, self.time_domain)
        pred = apply_fn(params, jnp.concatenate([x, t], axis=-1))
        metrics["has_nan"] = bool(jnp.any(~jnp.isfinite(pred)))
        amplitude = float((self.settings.exact_solution or {}).get("amplitude", 1.0))
        metrics["within_bounds"] = bool(jnp.all(jnp.abs(pred) <= abs(amplitude) * 1.5 + 1e-3))
        if self.dimension == 1 and "periodic" in self.boundary_conditions:
            t_line = jnp.linspace(self.time_domain[0], self.time_domain[1], 64).reshape(-1, 1)
            z_lo = jnp.concatenate([jnp.full_like(t_line, self.domain[0][0]), t_line], axis=1)
            z_hi = jnp.concatenate([jnp.full_like(t_line, self.domain[0][1]), t_line], axis=1)
            u_lo = apply_fn(params, z_lo)
            u_hi = apply_fn(params, z_hi)
            periodic_err = float(jnp.mean((u_lo - u_hi) ** 2))
            metrics["periodic_bc_error"] = periodic_err
            metrics["periodic_bc_ok"] = periodic_err < 1e-3
        return metrics
