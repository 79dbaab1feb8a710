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
            eps = float(spec.get("epsilon", 0.1))
            if self.dimension == 1:
                return jnp.tanh((x[:, 0:1] - 0.5 - nu * t) / eps)
            sol = jnp.ones_like(x[:, 0:1])
            for dim in range(self.dimension):
                sol = sol * jnp.tanh((x[:, dim : dim + 1] - 0.5 - nu * t) / eps)
            return sol
        raise ValueError(f"Unsupported exact solution type {sol_type!r}")

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "sine")
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
