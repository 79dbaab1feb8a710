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
        if ic_type == "sine" and self.settings.exact_solution:
            # NOTE: the reference's wave config is internally inconsistent —
            # exact solution sin(2*pi*(x-ct)) but IC target sin(k*pi*x) and
            # Dirichlet-0 BCs (reference: wave_equation.py:121-160 +
            # config.yaml wave block), so its "exact" can never be learned.
            # When an exact solution is configured we target ITS trace at
            # t=0, making the benchmark well-posed.
            return lambda x, t: self.exact_solution(x, jnp.zeros_like(x[:, 0:1]))
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

    def _create_boundary_condition(self, bc_type: str, params: Dict) -> Callable:
        if bc_type == "dirichlet" and self.settings.exact_solution:
            # Exact-solution trace at the boundary (the traveling wave is not
            # zero at the endpoints; fixed-0 BCs contradict it).
            return lambda x, t: self.exact_solution(x, t)
        return super()._create_boundary_condition(bc_type, params)

    def compute_loss(self, apply_fn, params, x, t, coeffs=None, key=None):
        """Adds the velocity initial condition u_t(x, 0) = d/dt u_exact —
        a 2nd-order-in-time PDE is underdetermined with only u(x, 0)."""
        losses = super().compute_loss(apply_fn, params, x, t, coeffs=coeffs, key=key)
        if not self.settings.exact_solution:
            return losses
        from pinnrl_tpu.ops.derivatives import directional_derivative

        c = self._c(coeffs)
        key = key if key is not None else jax.random.PRNGKey(0)
        _, n_i = self._bc_counts(x.shape[0])
        x_i, t_i = self._sample_initial_points(jax.random.fold_in(key, 0x1C), n_i)
        u = self._scalar_u(apply_fn, params)
        z_i = jnp.concatenate([x_i, t_i], axis=-1)
        u_t0 = jax.vmap(
            lambda zz: directional_derivative(u, zz, self.dimension, 1)[0]
        )(z_i).reshape(-1, 1)
        # d/dt sin(2*pi*(x - c t)) at t=0 = -2*pi*c*cos(2*pi*x)
        target = -2 * jnp.pi * c * jnp.cos(2 * jnp.pi * x_i[:, 0:1])
        velocity_ic = self._loss(u_t0 - target)
        losses["initial"] = losses["initial"] + velocity_ic
        lw = self._loss_weights()
        w_ic = float(lw.get("initial", 10.0))
        mode = self._training_mode()
        active = 0.0 if mode == "data_only" else 1.0
        losses["total"] = losses["total"] + active * w_ic * velocity_ic
        return losses
