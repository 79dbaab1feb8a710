"""Cahn-Hilliard equation u_t = lap(mu), mu = -eps^2 lap(u) + u^3 - u
(reference: pinnrl/pdes/cahn_hilliard.py).

4th-order in space via two nested Laplacians: the chemical potential is
itself a point-wise function, and its Laplacian is taken with the same
forward-mode engine — nested jvp-of-jvp compiles to one fused XLA program.
The u**3 argument is clamped to +-10 for stability with untrained networks
(reference: cahn_hilliard.py:112-114).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from pinnrl_tpu.ops.derivatives import directional_derivative, laplacian
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class CahnHilliardEquation(PDEBase):
    pde_type = "cahn_hilliard"
    default_parameters = {"epsilon": 0.1, "mobility": 1.0, "kappa": 0.01}
    spatial_orders = (2, 4)
    temporal_orders = (1,)
    # The residual differentiates the composed chemical potential
    # mu(z) = u^3 - u - eps^2 lap(u), which a precomputed u-derivative
    # bundle cannot serve (see PDEBase.bundle_compatible).
    bundle_compatible = False

    def __init__(self, settings, training=None):
        # Spectral (ETDRK4) time-dependent reference, built BEFORE
        # super().__init__ because the base constructor materializes the IC
        # closure which reads it (see AllenCahnEquation.__init__).
        self._spectral = None
        if (getattr(settings, "exact_solution", None) or {}).get("type") == "spectral":
            from pinnrl_tpu.numerical_solvers.spectral import (
                build_phase_field_reference,
            )

            eps = float((settings.parameters or {}).get("epsilon", 0.1))
            self._spectral = build_phase_field_reference(
                "cahn_hilliard", settings, eps
            )
            self._spectral_u = jnp.asarray(self._spectral.u)
        super().__init__(settings, training)
        # parameters.formulation = "mixed" switches to the classical mixed
        # (u, mu) weak form: a 2-channel head where channel 1 learns the
        # chemical potential directly, tied by the compatibility residual
        # mu = u^3 - u - eps^2 lap(u). The biharmonic never appears — both
        # residuals need only SECOND-order jets of the network, trading a
        # 2-wide output head for a far better-conditioned loss (same trade
        # as KdV's first_order formulation; cf. FO-PINNs, arXiv:2210.14320,
        # and the standard mixed FEM splitting of Cahn-Hilliard).
        if str(self.parameters.get("formulation", "direct")) == "mixed":
            self.system_size = 2
            self.spatial_orders = (2,)

    def _eps(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "epsilon", default=0.1)

    def residual_pointwise_system(self, uvec, z: jax.Array, coeffs: Optional[Coeffs]):
        """Mixed-form residual vector over the 2-channel head (u, mu):

            r1 = u_t - lap(mu)                      (dynamics)
            r2 = mu - (u^3 - u - eps^2 lap(u))      (compatibility)

        One second-order jet per spatial axis serves BOTH channels (jvp of
        the vector restriction), plus one first-order time jvp."""
        eps = self._eps(coeffs)
        vals = uvec(z)
        u_val, mu_val = vals[0], vals[1]
        lap = jnp.zeros_like(vals)
        for ax in range(self.dimension):
            lap = lap + directional_derivative(uvec, z, ax, 2)[1]
        u_t = directional_derivative(uvec, z, self.dimension, 1)[0][0]
        u_c = jnp.clip(u_val, -10.0, 10.0)
        r1 = u_t - lap[1]
        r2 = mu_val - (u_c**3 - u_c - eps**2 * lap[0])
        return jnp.stack([r1, r2])

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        u_t = directional_derivative(u, z, self.dimension, 1)[0]
        eps = self._eps(coeffs)
        axes = range(self.dimension)

        def mu(zz: jax.Array) -> jax.Array:
            val = u(zz)
            val_c = jnp.clip(val, -10.0, 10.0)
            return -(eps**2) * laplacian(u, zz, axes) + val_c**3 - val_c

        lap_mu = laplacian(mu, z, axes)
        return u_t - lap_mu

    def compute_loss(self, apply_fn, params, x, t, coeffs=None, key=None):
        """Adds the mass-conservation penalty when ``loss_weights.mass > 0``.

        CH is an H^-1 gradient flow: the spatial mean of u is conserved
        exactly, and it is the GLOBAL invariant that pins interface
        positions — round-3 dynamics probes all converged to tiny residuals
        with drifting mass and O(1) position error (docs/roadmap.md). The
        penalty ties the 1D spatial mean of u at K random times to the IC's
        mean on a fixed x-grid (one extra (K*G)-point forward pass)."""
        losses = super().compute_loss(apply_fn, params, x, t, coeffs=coeffs, key=key)
        w_mass = float(self._loss_weights().get("mass", 0.0))
        if w_mass <= 0.0 or self.dimension != 1:
            return losses
        key = key if key is not None else jax.random.PRNGKey(0)
        G, K = 128, 16
        (x_lo, x_hi) = self.domain[0]
        xs = jnp.linspace(x_lo, x_hi, G).reshape(-1, 1)
        ts = jax.random.uniform(
            jax.random.fold_in(key, 0x3A55), (K, 1),
            minval=self.time_domain[0], maxval=self.time_domain[1],
        )
        ic_fn = self.boundary_conditions.get("initial")
        mass0 = (
            jnp.mean(ic_fn(xs, jnp.zeros_like(xs)))
            if ic_fn is not None else jnp.zeros(())
        )
        xg = jnp.tile(xs, (K, 1))
        tg = jnp.repeat(ts, G, axis=0)
        u = apply_fn(params, jnp.concatenate([xg, tg], axis=-1)).reshape(
            K, G, -1
        )[..., 0]
        mass_loss = jnp.mean((jnp.mean(u, axis=1) - mass0) ** 2)
        losses["mass"] = mass_loss
        mode = self._training_mode()
        active = 0.0 if mode == "data_only" else 1.0
        losses["total"] = losses["total"] + active * w_mass * mass_loss
        losses = self._mu_h2_penalty(apply_fn, params, coeffs, key, losses, active)
        return losses

    def _mu_h2_penalty(self, apply_fn, params, coeffs, key, losses, active):
        """μ-channel H²-weighted residual penalty (``loss_weights.mu_h2``).

        Round-4 obstruction analysis (benchmark_results/README.md): in the
        mixed form a compatibility-residual error r2 at wavenumber k forces
        the dynamics through Δr2, i.e. k²-amplified — noise the plain L2
        residual cannot see. This term measures mean-square Δr2 SPECTRALLY
        (rfft over a periodic x-grid at K random times, Parseval-weighted
        k⁴|r̂2|²), penalizing exactly the amplified channel at
        second-order-jet cost — no 4th-order nesting."""
        w_h2 = float(self._loss_weights().get("mu_h2", 0.0))
        if w_h2 <= 0.0 or self.dimension != 1 or self.system_size < 2:
            return losses
        G, K = 128, 8
        (x_lo, x_hi) = self.domain[0]
        L = x_hi - x_lo
        xs = (x_lo + (L / G) * jnp.arange(G)).reshape(-1, 1)  # periodic grid
        ts = jax.random.uniform(
            jax.random.fold_in(key, 0x4D55), (K, 1),
            minval=self.time_domain[0], maxval=self.time_domain[1],
        )
        xg = jnp.tile(xs, (K, 1))
        tg = jnp.repeat(ts, G, axis=0)
        r = self.compute_residual(apply_fn, params, xg, tg, coeffs)
        r_mu = r.reshape(K, G, -1)[..., 1]
        # Truncated DFT as matmul, NOT jnp.fft: the axon TPU backend's FFT
        # adjoint is unreliable under jit (the FNO hit UNIMPLEMENTED; long
        # CH runs crashed the worker outright — round-5 queue logs). Real
        # cos/sin contractions lower as plain MXU matmuls everywhere.
        import numpy as _np

        idx_np = _np.arange(G // 2 + 1)
        theta = 2.0 * _np.pi * _np.outer(_np.arange(G), idx_np) / G  # (G, M)
        cosm = jnp.asarray(_np.cos(theta), r_mu.dtype)
        sinm = jnp.asarray(_np.sin(theta), r_mu.dtype)
        re = (r_mu @ cosm) / G
        im = (r_mu @ sinm) / G  # sign-flipped vs rfft; |.|^2 is identical
        kf = jnp.asarray((2.0 * _np.pi / L) * idx_np, r_mu.dtype)
        # One-sided spectrum: double interior modes (Parseval); DC and (for
        # even G) Nyquist appear once.
        mult = jnp.asarray(
            _np.where((idx_np == 0) | (idx_np == G // 2), 1.0, 2.0),
            r_mu.dtype,
        )
        h2 = jnp.mean(jnp.sum(mult * kf**4 * (re**2 + im**2), axis=1))
        losses["mu_h2"] = h2
        losses["total"] = losses["total"] + active * w_h2 * h2
        return losses

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None):
        """Typed exact solutions.

        - ``tanh`` / ``spinodal`` (default, reference parity,
          reference: cahn_hilliard.py:162-178): tanh(x/(2 eps)) interface
          profile. NOTE: this is NOT an exact CH solution — with width
          2*eps the chemical potential mu = -eps^2 u'' + u^3 - u is
          nonzero (residual O(1)); kept for behavioral parity only.
        - ``stationary_interface``: the genuine standing interface
          u = tanh(x0 / (sqrt(2) eps)) — mu vanishes identically
          (2 eps^2 / a^2 = 1 at a = sqrt(2) eps), hence u_t = lap(mu) = 0
          and the CH residual is exactly zero in ANY dimension (flat
          interface normal to axis 0). The genuine benchmark target for
          the 4th-order residual path.
        """
        spec = self.settings.exact_solution or {}
        sol_type = spec.get("type", "tanh")
        eps = self._eps(coeffs)
        if sol_type == "spectral":
            from pinnrl_tpu.numerical_solvers.spectral import interp_trajectory

            x_min, x_max = self.settings.domain[0]
            return interp_trajectory(
                self._spectral_u, x, t, x_min, x_max,
                float(self.settings.time_domain[1]),
            )
        if sol_type == "stationary_interface":
            a = jnp.sqrt(2.0) * eps
            return jnp.tanh(x[:, 0:1] / a)
        if self.dimension == 1:
            return jnp.tanh(x[:, 0:1] / (2 * eps))
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            sol = sol * jnp.tanh(x[:, dim : dim + 1] / (2 * eps))
        return sol

    def _create_initial_condition(self, params: Dict) -> Callable:
        ic_type = params.get("type", "tanh")
        if ic_type == "spectral" or self._spectral is not None:
            # t=0 trace of the spectral reference (spinodal perturbation).
            return lambda x, t: self.exact_solution(x, jnp.zeros_like(x[:, 0:1]))
        if (
            ic_type == "stationary_interface"
            or (self.settings.exact_solution or {}).get("type")
            == "stationary_interface"
        ):
            # Well-posedness: when benchmarking against the stationary
            # interface, the IC must be its t=0 trace (mirrors the Burgers
            # traveling-wave benchmark's exact-trace IC).
            return lambda x, t: self.exact_solution(x, jnp.zeros_like(x[:, 0:1]))
        if ic_type == "tanh":
            if self.dimension == 1:
                return lambda x, t: jnp.tanh(x[:, 0:1] / (2 * self._eps(None)))
            return lambda x, t: jnp.tanh(
                jnp.sum(x, axis=1, keepdims=True) / (2 * self._eps(None))
            )
        return super()._create_initial_condition(params)

    def _create_boundary_condition(self, bc_type: str, params: Dict) -> Callable:
        if (
            bc_type == "dirichlet"
            and (self.settings.exact_solution or {}).get("type")
            == "stationary_interface"
        ):
            # The interface's boundary trace varies along the faces (it is
            # +/-tanh(L/(sqrt(2) eps)) only on the x-faces) — target the
            # exact trace, mirroring the Burgers traveling-wave benchmark.
            return lambda x, t: self.exact_solution(x, t)
        return super()._create_boundary_condition(bc_type, params)
