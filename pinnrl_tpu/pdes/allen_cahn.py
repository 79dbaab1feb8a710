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

    def __init__(self, settings, training=None):
        # Built BEFORE super().__init__: the base constructor materializes
        # the IC closure, which reads the spectral trajectory.
        self._spectral = None
        if (getattr(settings, "exact_solution", None) or {}).get("type") == "spectral":
            # Time-dependent benchmark target: ETDRK4 spectral trajectory of
            # the same equation (spinodal decomposition), built eagerly so
            # it is a constant inside every jitted loss/validation program.
            from pinnrl_tpu.numerical_solvers.spectral import (
                build_phase_field_reference,
            )

            eps = float((settings.parameters or {}).get("epsilon", 0.1))
            self._spectral = build_phase_field_reference(
                "allen_cahn", settings, eps
            )
            self._spectral_u = jnp.asarray(self._spectral.u)
        super().__init__(settings, training)

    def _spectral_lookup(self, x, t):
        from pinnrl_tpu.numerical_solvers.spectral import interp_trajectory

        x_min, x_max = self.settings.domain[0]
        return interp_trajectory(
            self._spectral_u, x, t, x_min, x_max,
            float(self.settings.time_domain[1]),
        )

    def _eps(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "epsilon", default=0.1)

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        val = u(z)
        u_t = directional_derivative(u, z, self.dimension, 1)[0]
        lap = laplacian(u, z, range(self.dimension))
        return u_t - self._eps(coeffs) ** 2 * lap - val + val**3

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        """Tanh interface profile.

        The reference's ``tanh(x / 2eps)`` (reference: allen_cahn.py:113-130)
        is NOT a stationary solution — it leaves an O(0.1) residual
        ``(u^3 - u)/2`` even in float64. The genuine stationary interface of
        ``u_t = eps^2 u_xx + u - u^3`` is ``tanh(x / (sqrt(2) eps))``;
        request it with ``exact_solution.type: stationary_interface`` (the
        convergence benchmark does). Default stays reference-parity.
        """
        eps = self._eps(coeffs)
        spec = self.settings.exact_solution or {}
        kind = spec.get("type", "tanh") if isinstance(spec, dict) else "tanh"
        if kind == "spectral":
            return self._spectral_lookup(x, t)
        width = jnp.sqrt(2.0) * eps if kind == "stationary_interface" else 2 * eps
        if self.dimension == 1:
            return jnp.tanh(x[:, 0:1] / width)
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            sol = sol * jnp.tanh(x[:, dim : dim + 1] / width)
        return sol

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "tanh")
        if ic_type == "spectral" or self._spectral is not None:
            # Well-posedness: the IC must be the t=0 trace of the spectral
            # reference (the spinodal perturbation).
            return lambda x, t: self._spectral_lookup(x, jnp.zeros_like(x[:, 0:1]))
        if ic_type in ("tanh", "stationary_interface"):
            eps = self._eps(None)
            width = jnp.sqrt(2.0) * eps if ic_type == "stationary_interface" else 2 * eps
            if self.dimension == 1:
                return lambda x, t: jnp.tanh(x[:, 0:1] / width)
            return lambda x, t: jnp.tanh(
                jnp.sum(x, axis=1, keepdims=True) / width
            )
        return super()._create_initial_condition(params)
