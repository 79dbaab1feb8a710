"""Loss reductions: mse / mae / huber over residual-style arrays.

Matches the reference's ``PDEBase._apply_loss_fn`` semantics
(reference: pinnrl/pdes/pde_base.py:293-326): the loss function is applied
to a *difference* array (residual, u_pred - u_target, ...) and reduced by
mean. Selection is static per training config so jit specializes the branch.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_loss_fn(diff: jnp.ndarray, loss_function: str = "mse", huber_delta: float = 1.0):
    """Reduce a difference array to a scalar loss."""
    if loss_function == "mse":
        return jnp.mean(diff**2)
    if loss_function == "mae":
        return jnp.mean(jnp.abs(diff))
    if loss_function == "huber":
        ad = jnp.abs(diff)
        quad = 0.5 * diff**2
        lin = huber_delta * (ad - 0.5 * huber_delta)
        return jnp.mean(jnp.where(ad <= huber_delta, quad, lin))
    raise ValueError(f"Unknown loss_function {loss_function!r}; valid: mse|mae|huber")


def relative_l2(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-12):
    """Relative L2 error ||pred-target|| / ||target|| (north-star metric)."""
    num = jnp.sqrt(jnp.sum((pred - target) ** 2))
    den = jnp.sqrt(jnp.sum(target**2))
    return num / (den + eps)
