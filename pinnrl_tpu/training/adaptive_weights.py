"""Adaptive loss weighting (LRW / RBW) as pure state transitions.

Functional redesign of the reference ``AdaptiveLossWeights``
(reference: pinnrl/components/adaptive_weights.py:6-134): the running EMAs
and previous weights live in an explicit state pytree carried through the
jitted train step, instead of mutable object attributes.

- RBW (relative-error based): EMA of loss magnitudes -> normalized weights,
  then EMA-smoothed against the previous weights
  (reference: adaptive_weights.py:68-107).
- LRW (learning-rate / gradient based): EMA of per-component grad norms ->
  weights proportional to inverse gradient magnitude
  (reference: adaptive_weights.py:35-66). In JAX the per-component gradient
  norms come from one ``jax.jacrev`` over the stacked component losses
  inside the same XLA program — not N separate backward passes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class AdaptiveWeightState:
    running: jax.Array  # EMA of losses (rbw) or grad norms (lrw)
    weights: jax.Array
    prev_weights: jax.Array
    initialized: jax.Array  # bool scalar


class AdaptiveLossWeights:
    """Static strategy + hyperparams; `update` is a pure, jittable transition."""

    def __init__(
        self,
        strategy: str = "rbw",
        alpha: float = 0.9,
        eps: float = 1e-5,
        initial_weights: Optional[Sequence[float]] = None,
        num_components: int = 3,
    ):
        self.strategy = strategy.lower()
        if self.strategy not in ("lrw", "rbw"):
            raise ValueError(f"strategy must be lrw|rbw, got {strategy!r}")
        self.alpha = float(alpha)
        self.eps = float(eps)
        self.num_components = num_components
        if initial_weights is not None:
            self.initial_weights = jnp.asarray(initial_weights, jnp.float32)
        else:
            self.initial_weights = jnp.ones((num_components,)) / num_components

    def init(self) -> AdaptiveWeightState:
        n = self.num_components
        # Distinct copies: aliased leaves break buffer donation under jit.
        return AdaptiveWeightState(
            running=jnp.zeros((n,)),
            weights=jnp.array(self.initial_weights),
            prev_weights=jnp.array(self.initial_weights),
            initialized=jnp.zeros((), bool),
        )

    def update(self, state: AdaptiveWeightState, values: jax.Array) -> AdaptiveWeightState:
        """``values``: per-component losses (rbw) or grad norms (lrw)."""
        first = ~state.initialized
        running = jnp.where(first, values, self.alpha * state.running + (1 - self.alpha) * values)

        if self.strategy == "lrw":
            inv = 1.0 / (running + self.eps)
            new_w = inv / jnp.sum(inv)
        else:  # rbw: higher loss -> higher weight, EMA-smoothed
            new_w = running / (jnp.sum(running) + self.eps)
            new_w = jnp.where(
                first, new_w, self.alpha * state.prev_weights + (1 - self.alpha) * new_w
            )

        weights = jnp.where(first, self.initial_weights, new_w)
        return AdaptiveWeightState(
            running=running,
            weights=weights,
            prev_weights=weights,
            initialized=jnp.ones((), bool),
        )

    def get_weights(self, state: AdaptiveWeightState) -> jax.Array:
        return state.weights
