"""Burgers equation u_t + u.grad(u) = nu*lap(u)
(reference: pinnrl/pdes/burgers_equation.py)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from pinnrl_tpu.ops.derivatives import directional_derivative, laplacian
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class BurgersEquation(PDEBase):
    pde_type = "burgers"
    default_parameters = {"nu": 0.01}
    spatial_orders = (1, 2)
    temporal_orders = (1,)

    def _nu(self, coeffs: Optional[Coeffs]):
        # Config may name it "nu" or "viscosity".
        if "nu" in self.parameters or (coeffs and "nu" in coeffs):
            return self.coeff(coeffs, "nu", default=0.01)
        return self.coeff(coeffs, "viscosity", default=0.01)

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        val = u(z)
        u_t = directional_derivative(u, z, self.dimension, 1)[0]
        lap = jnp.zeros(())
        convection = jnp.zeros(())
        for ax in range(self.dimension):
            d1, d2 = directional_derivative(u, z, ax, 2)
            lap = lap + d2
            convection = convection + val * d1
        return u_t + convection - self._nu(coeffs) * lap

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        """Cole-Hopf or tanh traveling wave (reference: burgers_equation.py:78-130).

        The reference computes phi_x with autograd; here it's analytic:
        phi = -cos(k*pi*x) * exp(-nu*(k*pi)^2*t), phi_x = k*pi*sin(k*pi*x)*exp(...),
        so u = -2*nu*phi_x/phi reproduces the same field without AD.
        """
        spec = self.settings.exact_solution or {}
        sol_type = spec.get("type", "cole_hopf")
        nu = self._nu(coeffs)
        if sol_type == "cole_hopf":
            nu_s = float(spec.get("viscosity", 0.0)) or nu
            k = float(spec.get("initial_frequency", 1.0))

            def one_dim(xi):
                phi = -jnp.cos(k * jnp.pi * xi) * jnp.exp(-nu_s * (k * jnp.pi) ** 2 * t)
                phi_x = k * jnp.pi * jnp.sin(k * jnp.pi * xi) * jnp.exp(
                    -nu_s * (k * jnp.pi) ** 2 * t
                )
                return -2 * nu_s * phi_x / phi

            if self.dimension == 1:
                return one_dim(x[:, 0:1])
            sol = jnp.ones_like(x[:, 0:1])
            for dim in range(self.dimension):
                sol = sol * one_dim(x[:, dim : dim + 1])
            return sol
        if sol_type == "tanh":
            # Reference-parity form tanh((x - 0.5 - nu*t)/eps)
            # (reference: burgers_equation.py:117-127). NOTE: this is NOT an
            # exact Burgers solution for arbitrary (eps, nu) — its residual is
            # O(1); kept for behavioral parity. For a genuine benchmark
            # target use type "traveling_wave" below.
            eps = float(spec.get("epsilon", 0.1))
            if self.dimension == 1:
                return jnp.tanh((x[:, 0:1] - 0.5 - nu * t) / eps)
            sol = jnp.ones_like(x[:, 0:1])
            for dim in range(self.dimension):
                sol = sol * jnp.tanh((x[:, dim : dim + 1] - 0.5 - nu * t) / eps)
            return sol
        if sol_type == "traveling_wave":
            # Genuine viscous-shock traveling wave:
            #   u(x, t) = c - a * tanh(a * (x - x0 - c*t) / (2*nu))
            # Exact for ANY amplitude a, speed c, center x0 (substitute into
            # u_t + u u_x = nu u_xx: both sides reduce to the same sech^2
            # profile). Front width ~ 4*nu/a, so small nu gives the steep
            # moving shock the RL/RAR samplers are built for.
            a = float(spec.get("amplitude", 0.5))
            c = float(spec.get("speed", 0.5))
            x0 = float(spec.get("center", 0.0))
            return c - a * jnp.tanh(a * (x[:, 0:1] - x0 - c * t) / (2.0 * nu))
        raise ValueError(f"Unsupported exact solution type {sol_type!r}")

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "sine")
        if ic_type == "traveling_wave" or (
            (self.settings.exact_solution or {}).get("type") == "traveling_wave"
        ):
            # IC = the exact traveling wave at t=0, so the benchmark is
            # well-posed (mirrors the wave equation's exact-trace IC fix).
            return lambda x, t: self.exact_solution(x, jnp.zeros_like(x[:, 0:1]))
        if ic_type == "sine":
            A = float(params.get("amplitude", -1.0))
            k = float(params.get("frequency", 1.0))
            if self.dimension == 1:
                return lambda x, t: A * jnp.sin(k * jnp.pi * x[:, 0:1])
            return lambda x, t: A * jnp.prod(jnp.sin(k * jnp.pi * x), axis=1, keepdims=True)
        if ic_type == "tanh":
            eps = float(params.get("epsilon", 0.1))
            if self.dimension == 1:
                return lambda x, t: jnp.tanh((x[:, 0:1] - 0.5) / eps)
            return lambda x, t: jnp.prod(jnp.tanh((x - 0.5) / eps), axis=1, keepdims=True)
        return super()._create_initial_condition(params)

    def _create_boundary_condition(self, bc_type: str, params: Dict) -> Callable:
        if (
            bc_type == "dirichlet"
            and (self.settings.exact_solution or {}).get("type") == "traveling_wave"
        ):
            # The moving front's endpoint values are +/-a offsets around c,
            # not zero — target the exact trace at the boundary.
            return lambda x, t: self.exact_solution(x, t)
        return super()._create_boundary_condition(bc_type, params)
