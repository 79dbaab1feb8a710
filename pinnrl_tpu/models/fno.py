"""Point-wise Fourier Neural Operator (reference: pinnrl/neural_networks/fno.py).

Like the reference, this is a *point-wise* FNO: inputs are (x, t) coordinates,
and the spectral convolution acts along the hidden **channel** axis
(reference: fno.py:19-60 — rfft over the feature dim, learnable complex
(modes x modes) mixing, zero-pad, irfft). Complex weights are stored as
separate real/imag float32 leaves so optimizers and TPU matmuls stay real.

The frequency mixing is a pair of real matmuls — MXU-friendly; ffts along a
256-wide channel axis are tiny and XLA-fused.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pinnrl_tpu.models.base import get_activation


class SpectralConv(nn.Module):
    """Channel-spectral convolution: rfft -> truncated complex mix -> irfft."""

    hidden_dim: int
    modes: int

    @nn.compact
    def __call__(self, x):
        n_freq = self.hidden_dim // 2 + 1
        modes = min(self.modes, n_freq)
        scale = 1.0 / (self.hidden_dim * max(modes, 1))
        w_re = self.param(
            "w_re", nn.initializers.normal(scale), (modes, modes), jnp.float32
        )
        w_im = self.param(
            "w_im", nn.initializers.normal(scale), (modes, modes), jnp.float32
        )
        xf = jnp.fft.rfft(x, axis=-1)  # (..., n_freq) complex
        low = xf[..., :modes]
        w = w_re + 1j * w_im
        mixed = jnp.einsum("...m,mn->...n", low, w)
        out = jnp.concatenate(
            [mixed, jnp.zeros(x.shape[:-1] + (n_freq - modes,), mixed.dtype)], axis=-1
        )
        return jnp.fft.irfft(out, n=self.hidden_dim, axis=-1)


class FNOBlock(nn.Module):
    """Spectral conv + linear bypass + residual + LayerNorm (reference: fno.py:63-92)."""

    hidden_dim: int
    modes: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        h = SpectralConv(self.hidden_dim, self.modes)(x) + nn.Dense(self.hidden_dim)(x)
        return nn.LayerNorm()(x + act(h))


class FNONetwork(nn.Module):
    """lift (2-layer GELU MLP) -> N FNO blocks -> project (reference: fno.py:95-146)."""

    input_dim: int
    output_dim: int
    hidden_dim: int = 256
    num_blocks: int = 4
    modes: int = 16
    activation: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation)
        x = nn.Dense(self.hidden_dim)(x)
        x = act(x)
        x = nn.Dense(self.hidden_dim)(x)
        for _ in range(self.num_blocks):
            x = FNOBlock(self.hidden_dim, self.modes, self.activation)(x)
        x = nn.Dense(self.hidden_dim // 2)(x)
        x = act(x)
        return nn.Dense(self.output_dim)(x)
