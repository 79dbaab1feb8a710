"""SIREN: sinusoidal representation network (reference: pinnrl/neural_networks/siren.py:11-90).

Layers compute ``sin(omega_0 * (W x + b))`` with the SIREN initialization:
first layer ~ U[-1/fan_in, 1/fan_in]; hidden layers ~ U[+-sqrt(6/fan_in)/omega_0]
(reference init: siren.py:28-34).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _siren_init(omega_0: float, is_first: bool):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = (1.0 / fan_in) if is_first else (jnp.sqrt(6.0 / fan_in) / omega_0)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SIRENLayer(nn.Module):
    """One fused sin(omega_0 * (W x + b)) layer.

    Routes through the Pallas kernel (pinnrl_tpu.ops.kernels.siren) on TPU
    for tile-aligned 2D batches; the kernel's analytic custom_jvp keeps
    nested forward-mode derivatives exact.
    """

    features: int
    omega_0: float = 30.0
    is_first: bool = False

    @nn.compact
    def __call__(self, x):
        from pinnrl_tpu.ops.kernels.siren import siren_layer

        W = self.param(
            "kernel",
            _siren_init(self.omega_0, self.is_first),
            (x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if x.ndim == 2:
            return siren_layer(x, W, b, self.omega_0)
        return jnp.sin(self.omega_0 * (x @ W + b))


class SIREN(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dims: Sequence[int] = (124,) * 7
    omega_0: float = 30.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, width in enumerate(self.hidden_dims):
            x = SIRENLayer(width, self.omega_0, is_first=(i == 0))(x)
        return nn.Dense(
            self.output_dim, kernel_init=_siren_init(self.omega_0, False)
        )(x)
