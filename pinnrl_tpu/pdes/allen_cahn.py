"""Allen-Cahn equation u_t = eps^2 lap(u) + u - u^3
(reference: pinnrl/pdes/allen_cahn.py)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from pinnrl_tpu.ops.derivatives import directional_derivative, laplacian
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class AllenCahnEquation(PDEBase):
    pde_type = "allen_cahn"
    default_parameters = {"epsilon": 0.1}
    spatial_orders = (2,)
    temporal_orders = (1,)

    def _eps(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "epsilon", default=0.1)

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        val = u(z)
        u_t = directional_derivative(u, z, self.dimension, 1)[0]
        lap = laplacian(u, z, range(self.dimension))
        return u_t - self._eps(coeffs) ** 2 * lap - val + val**3

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        """Stationary tanh interface profile (reference: allen_cahn.py:113-130)."""
        eps = self._eps(coeffs)
        if self.dimension == 1:
            return jnp.tanh(x[:, 0:1] / (2 * eps))
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            sol = sol * jnp.tanh(x[:, dim : dim + 1] / (2 * eps))
        return sol

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "tanh")
        if ic_type == "tanh":
            if self.dimension == 1:
                return lambda x, t: jnp.tanh(x[:, 0:1] / (2 * self._eps(None)))
            return lambda x, t: jnp.tanh(
                jnp.sum(x, axis=1, keepdims=True) / (2 * self._eps(None))
            )
        return super()._create_initial_condition(params)
