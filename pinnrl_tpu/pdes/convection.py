"""Convection equation u_t + v.grad(u) = 0
(reference: pinnrl/pdes/convection_equation.py)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from pinnrl_tpu.ops.derivatives import directional_derivative
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class ConvectionEquation(PDEBase):
    pde_type = "convection"
    default_parameters = {"velocity": 1.0}
    spatial_orders = (1,)
    temporal_orders = (1,)

    def _velocity(self, coeffs: Optional[Coeffs]) -> List:
        """Scalar -> per-dimension vector promotion (reference: convection_equation.py:34-41)."""
        v = self.coeff(coeffs, "velocity", default=1.0)
        if isinstance(v, (list, tuple)):
            return list(v)
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:
            return [v[i] for i in range(self.dimension)]
        return [v] * self.dimension

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        u_t = directional_derivative(u, z, self.dimension, 1)[0]
        v = self._velocity(coeffs)
        conv = jnp.zeros(())
        for ax in range(self.dimension):
            conv = conv + v[ax] * directional_derivative(u, z, ax, 1)[0]
        return u_t + conv

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        v = self._velocity(coeffs)
        if self.dimension == 1:
            return jnp.sin(2 * jnp.pi * (x[:, 0:1] - v[0] * t))
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            sol = sol * jnp.sin(2 * jnp.pi * (x[:, dim : dim + 1] - v[dim] * t))
        return sol

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "sine")
        if ic_type in ("sine", "sin"):
            A = float(params.get("amplitude", 1.0))
            k = float(params.get("frequency", 2.0))
            if self.dimension == 1:
                return lambda x, t: A * jnp.sin(k * jnp.pi * x[:, 0:1])
            return lambda x, t: A * jnp.sin(k * jnp.pi * jnp.sum(x, axis=1, keepdims=True))
        return super()._create_initial_condition(params)
