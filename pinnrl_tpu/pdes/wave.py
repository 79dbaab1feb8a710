"""Wave equation u_tt = c^2 * lap(u) (reference: pinnrl/pdes/wave_equation.py)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from pinnrl_tpu.ops.derivatives import directional_derivative, laplacian
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class WaveEquation(PDEBase):
    pde_type = "wave"
    default_parameters = {"c": 1.0}
    spatial_orders = (2,)
    temporal_orders = (2,)

    def _c(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "c", default=1.0)

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        u_tt = directional_derivative(u, z, self.dimension, 2)[1]
        lap = laplacian(u, z, range(self.dimension))
        return u_tt - self._c(coeffs) ** 2 * lap

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        """Traveling wave sin(2*pi*(x - c t)) (reference: wave_equation.py:121-135)."""
        c = self._c(coeffs)
        if self.dimension == 1:
            return jnp.sin(2 * jnp.pi * (x[:, 0:1] - c * t))
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            sol = sol * jnp.sin(2 * jnp.pi * (x[:, dim : dim + 1] - c * t))
        return sol

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "sine")
        if ic_type == "sine":
            A = float(params.get("amplitude", 1.0))
            k = float(params.get("frequency", 2.0))
            if self.dimension == 1:
                return lambda x, t: A * jnp.sin(k * jnp.pi * x[:, 0:1])
            return lambda x, t: A * jnp.sin(k * jnp.pi * jnp.sum(x, axis=1, keepdims=True))
        if ic_type == "sine_2d" and self.dimension == 2:
            A = float(params.get("amplitude", 1.0))
            kx = float(params.get("frequency_x", 2.0))
            ky = float(params.get("frequency_y", 2.0))
            return lambda x, t: (
                A * jnp.sin(kx * jnp.pi * x[:, 0:1]) * jnp.sin(ky * jnp.pi * x[:, 1:2])
            )
        return super()._create_initial_condition(params)
