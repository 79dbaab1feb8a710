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


import numpy as _np


def _dft_bases(C: int, modes: int):
    """Real matmul factorization of rfft-truncate / zero-pad-irfft.

    Small FFTs are faster as matmuls on the TPU MXU, and — unlike FFT
    primitives — plain matmuls are transparent to arbitrarily nested
    forward-mode AD (the PINN residual path differentiates through FNO up
    to 4th order). Forward: re = x @ F_cos, im = x @ F_sin. Inverse (with
    Hermitian weighting, zero-padded beyond ``modes``): y = re @ G_cos +
    im @ G_sin.
    """
    n = _np.arange(C)[:, None]
    k = _np.arange(modes)[None, :]
    ang = 2.0 * _np.pi * n * k / C
    F_cos = _np.cos(ang)
    F_sin = -_np.sin(ang)
    w = _np.where((k.ravel() == 0) | (2 * k.ravel() == C), 1.0, 2.0)
    G_cos = (w[:, None] * _np.cos(ang.T)) / C
    G_sin = -(w[:, None] * _np.sin(ang.T)) / C
    return (
        jnp.asarray(F_cos, jnp.float32),
        jnp.asarray(F_sin, jnp.float32),
        jnp.asarray(G_cos, jnp.float32),
        jnp.asarray(G_sin, jnp.float32),
    )


class SpectralConv(nn.Module):
    """Channel-spectral convolution: rfft -> truncated complex mix -> irfft.

    ``use_dft_matmul=True`` (default) computes the transform pair as four
    real matmuls against fixed DFT bases — MXU-resident and safe under
    nested jvp; ``False`` uses jnp.fft (reference-equivalent path).
    """

    hidden_dim: int
    modes: int
    use_dft_matmul: bool = True

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
        if self.use_dft_matmul:
            F_cos, F_sin, G_cos, G_sin = _dft_bases(self.hidden_dim, modes)
            re = x @ F_cos
            im = x @ F_sin
            out_re = re @ w_re - im @ w_im
            out_im = re @ w_im + im @ w_re
            return out_re @ G_cos + out_im @ G_sin
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
