"""Gridded 2D Fourier Neural Operator — true operator learning.

The reference's FNO is point-wise: its "spectral conv" FFTs along the
FEATURE dimension of single (x, t) coordinates (reference: fno.py:19-60),
so it cannot condition on an input FUNCTION. This module is the genuine
field-to-field FNO (Li et al. 2021, "Fourier Neural Operator for Parametric
PDEs"): inputs are whole fields on a regular grid, the spectral convolution
is a 2D spatial rfft with learnable complex weights on the retained modes,
and the learned map generalizes to unseen input functions — benchmarked in
``benchmarks/operator.py --gridded`` on held-out trajectories.

TPU notes: the per-mode complex contraction is einsum'd as two real MXU
matmuls (XLA has no complex MXU path); mode truncation keeps the weight
tensor tiny; everything jits into one program.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SpectralConv2d(nn.Module):
    """2D spectral convolution: rfft2 -> per-mode complex weights -> irfft2."""

    out_channels: int
    modes_x: int
    modes_y: int

    @nn.compact
    def __call__(self, v):  # v: (B, H, W, C)
        b, h, w, c = v.shape
        mx = min(self.modes_x, h // 2)
        my = min(self.modes_y, w // 2 + 1)

        def w_init(key, shape):
            import jax

            scale = 1.0 / (c * self.out_channels)
            return scale * jax.random.normal(key, shape)

        # Separate real/imag weight tensors for the low-frequency corner
        # blocks (positive and negative x-frequencies).
        shapes = (2, 2, mx, my, c, self.out_channels)
        wr = self.param("w_real", w_init, shapes[1:])
        wi = self.param("w_imag", w_init, shapes[1:])

        v_hat = jnp.fft.rfft2(v, axes=(1, 2))  # (B, H, W//2+1, C), complex
        out_hat = jnp.zeros(
            (b, h, w // 2 + 1, self.out_channels), dtype=v_hat.dtype
        )

        def mul(block, weights_r, weights_i):
            # block: (B, mx, my, C) complex; weights: (mx, my, C, O)
            wcplx = weights_r + 1j * weights_i
            return jnp.einsum("bxyc,xyco->bxyo", block, wcplx)

        out_hat = out_hat.at[:, :mx, :my].set(mul(v_hat[:, :mx, :my], wr[0], wi[0]))
        out_hat = out_hat.at[:, -mx:, :my].set(mul(v_hat[:, -mx:, :my], wr[1], wi[1]))
        return jnp.fft.irfft2(out_hat, s=(h, w), axes=(1, 2))


class GridFNOBlock(nn.Module):
    channels: int
    modes_x: int
    modes_y: int

    @nn.compact
    def __call__(self, v):
        spectral = SpectralConv2d(self.channels, self.modes_x, self.modes_y)(v)
        bypass = nn.Dense(self.channels)(v)  # 1x1 conv over channels
        return nn.gelu(spectral + bypass) + v


class GridFNO2D(nn.Module):
    """lift -> N spectral blocks -> project; (B, H, W, in) -> (B, H, W, out)."""

    in_channels: int = 1
    out_channels: int = 1
    width: int = 32
    modes: int = 12
    num_blocks: int = 4
    coord_features: bool = True

    @nn.compact
    def __call__(self, a):  # a: (B, H, W, in_channels)
        b, h, w, _ = a.shape
        if self.coord_features:
            xs = jnp.linspace(0.0, 1.0, h)
            ys = jnp.linspace(0.0, 1.0, w)
            X, Y = jnp.meshgrid(xs, ys, indexing="ij")
            coords = jnp.broadcast_to(
                jnp.stack([X, Y], axis=-1)[None], (b, h, w, 2)
            )
            a = jnp.concatenate([a, coords], axis=-1)
        v = nn.Dense(self.width)(a)
        v = nn.gelu(nn.Dense(self.width)(v))
        for _ in range(self.num_blocks):
            v = GridFNOBlock(self.width, self.modes, self.modes)(v)
        v = nn.gelu(nn.Dense(self.width)(v))
        return nn.Dense(self.out_channels)(v)
