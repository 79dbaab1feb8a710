"""Black-Scholes equation V_t + 0.5 sigma^2 S^2 V_SS + r S V_S - r V = 0
(reference: pinnrl/pdes/black_scholes.py).

NOTE: the reference's "closed form" uses torch.erf where the standard normal
CDF Phi belongs (reference: black_scholes.py:108-114). We reproduce that
behavior for parity (the survey's instruction: reproduce, fix at will); the
textbook-correct variant is available via exact_solution(..., use_cdf=True).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from pinnrl_tpu.ops.derivatives import directional_derivative
from pinnrl_tpu.pdes.base import Coeffs, PDEBase, PointFn, register_pde


@register_pde
class BlackScholesEquation(PDEBase):
    pde_type = "black_scholes"
    default_parameters = {"sigma": 0.2, "r": 0.05}
    spatial_orders = (1, 2)
    temporal_orders = (1,)

    def _sigma(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "sigma", default=0.2)

    def _r(self, coeffs: Optional[Coeffs]):
        return self.coeff(coeffs, "r", default=0.05)

    def _sample_initial_points(self, key: jax.Array, n: int):
        """Payoff-kink-aware IC sampling (round 5, VERDICT r4 job #6).

        The error-field diagnosis (r5_queue3 log) localized the recipe's
        1000x max-error outlier to EXACTLY (t=maturity, S=strike): the
        non-differentiable payoff kink, where uniform IC sampling puts
        ~n/200 points per unit of S. ``parameters.ic_strike_focus`` = f
        draws f*n of the initial points from a Gaussian around the strike
        (width ``parameters.ic_strike_width``, default 2.5% of the span)
        so the IC loss actually resolves the kink; the rest stay uniform."""
        frac = float(self.parameters.get("ic_strike_focus", 0.0) or 0.0)
        if frac <= 0.0:
            return super()._sample_initial_points(key, n)
        spec = self.settings.exact_solution or {}
        strike = float(spec.get("strike_price", spec.get("strike", 1.0)))
        los, his = self._space_bounds()
        # Static span from the config domain (jit-safe: _space_bounds may
        # return traced arrays inside the scanned train step).
        lo_f, hi_f = (float(v) for v in self.domain[0])
        width = float(
            self.parameters.get("ic_strike_width", 0.025 * (hi_f - lo_f))
        )
        k_u, k_g = jax.random.split(key)
        n_focus = int(round(frac * n))
        x_u = jax.random.uniform(
            k_u, (n - n_focus, self.dimension), minval=los, maxval=his
        )
        x_g = strike + width * jax.random.normal(k_g, (n_focus, self.dimension))
        x_g = jnp.clip(x_g, los, his)
        x = jnp.concatenate([x_u, x_g], axis=0)
        return x, jnp.full((n, 1), self.time_domain[0], jnp.float32)

    def canonicalize_coeffs(self, coeffs):
        """sigma appears in the residual only as sigma^2: identification is
        up to sign (observed: a seed converging to -0.1996 for truth 0.2).
        The canonical volatility is the non-negative root."""
        out = dict(coeffs)
        if "sigma" in out:
            out["sigma"] = abs(float(out["sigma"]))
        return out

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]):
        """Reference-parity residual uses CALENDAR time
        (``V_t + 0.5 s^2 S^2 V_SS + r S V_S - r V``, reference:
        black_scholes.py) — but the problem's IC pins the payoff at t=0,
        i.e. t is TIME-TO-MATURITY, under which the closed form solves the
        sign-flipped (heat-like) equation
        ``V_t - 0.5 s^2 S^2 V_SS - r S V_S + r V = 0`` instead. Set
        ``parameters.time_convention: to_maturity`` for the self-consistent
        variant (the convergence benchmark does); default keeps parity.
        """
        V = u(z)
        V_t = directional_derivative(u, z, self.dimension, 1)[0]
        sigma, r = self._sigma(coeffs), self._r(coeffs)
        sign = (
            -1.0
            if str(self.parameters.get("time_convention", "calendar")) == "to_maturity"
            else 1.0
        )
        res = V_t - sign * r * V
        for ax in range(self.dimension):
            S = z[ax]
            V_S, V_SS = directional_derivative(u, z, ax, 2)
            res = res + sign * (0.5 * sigma**2 * S**2 * V_SS + r * S * V_S)
        return res

    def exact_solution(self, x, t, coeffs: Optional[Coeffs] = None, use_cdf: bool = False):
        if not self.settings.exact_solution:
            return None
        spec = self.settings.exact_solution
        K = float(spec.get("strike_price", spec.get("strike", 1.0)))
        sigma, r = self._sigma(coeffs), self._r(coeffs)
        # YAML opt-in for the textbook CDF (exact_solution.cdf: true) so
        # config-driven paths (validate / convergence bench) can request it.
        use_cdf = use_cdf or bool(spec.get("cdf", False))
        cdf = norm.cdf if use_cdf else jax.scipy.special.erf

        def one_dim(S):
            S_safe = jnp.maximum(S, 1e-6)
            t_safe = jnp.maximum(t, 1e-6)
            d1 = (jnp.log(S_safe / K) + (r + 0.5 * sigma**2) * t_safe) / (
                sigma * jnp.sqrt(t_safe)
            )
            d2 = d1 - sigma * jnp.sqrt(t_safe)
            return S * cdf(d1) - K * jnp.exp(-r * t_safe) * cdf(d2)

        if self.dimension == 1:
            return one_dim(x[:, 0:1])
        sol = jnp.ones_like(x[:, 0:1])
        for dim in range(self.dimension):
            sol = sol * one_dim(x[:, dim : dim + 1])
        return sol
