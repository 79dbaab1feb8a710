"""Gridded 2D Fourier Neural Operator — true operator learning.

The reference's FNO is point-wise: its "spectral conv" FFTs along the
FEATURE dimension of single (x, t) coordinates (reference: fno.py:19-60),
so it cannot condition on an input FUNCTION. This module is the genuine
field-to-field FNO (Li et al. 2021, "Fourier Neural Operator for Parametric
PDEs"): inputs are whole fields on a regular grid, the spectral convolution
is a 2D spatial rfft with learnable complex weights on the retained modes,
and the learned map generalizes to unseen input functions — benchmarked in
``benchmarks/operator.py --gridded`` on held-out trajectories.

TPU notes (round 5): the spectral transform is a TRUNCATED DFT AS MATMUL —
only the retained low-frequency modes are ever computed, as four real
einsums against precomputed cos/sin matrices. Rationale: (a) mode
truncation means a full FFT wastes H·log H work on coefficients that are
immediately discarded, while the truncated DFT is a (2mx, H) × (H, ...)
MXU contraction; (b) FFT *gradients* are unimplemented on the axon TPU
backend (measured round 5 — forward rfft2 lowers, its VJP does not), and
the matmul path differentiates as plain matmuls. ``use_fft=True`` keeps
the FFT path for CPU parity tests; numerics are identical to
rfft2 -> block-multiply -> irfft2 (see tests/test_fno_grid.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _dft_mats(h: int, w: int, mx: int, my: int):
    """Host-side cos/sin matrices for the truncated 2D real DFT.

    x-axis keeps frequencies {0..mx-1} ∪ {h-mx..h-1} (the two learnable
    corner blocks); y-axis keeps one-sided {0..my-1}. Returned as numpy so
    they embed as MLIR constants (device arrays cannot, on axon)."""
    kx = np.concatenate([np.arange(mx), np.arange(h - mx, h)])  # (2mx,)
    n = np.arange(h)
    tx = 2.0 * np.pi * np.outer(kx, n) / h                      # (2mx, H)
    ly = np.arange(my)
    m = np.arange(w)
    ty = 2.0 * np.pi * np.outer(ly, m) / w                      # (my, W)
    dbl = np.where((ly == 0) | ((w % 2 == 0) & (ly == w // 2)), 1.0, 2.0)
    f32 = lambda a: np.asarray(a, np.float32)
    return (f32(np.cos(tx)), f32(np.sin(tx)), f32(np.cos(ty)),
            f32(np.sin(ty)), f32(dbl))


class SpectralConv2d(nn.Module):
    """2D spectral convolution: truncated DFT -> per-mode complex weights ->
    truncated inverse DFT (default), or rfft2/irfft2 with ``use_fft``."""

    out_channels: int
    modes_x: int
    modes_y: int
    use_fft: bool = False

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

        if self.use_fft:
            v_hat = jnp.fft.rfft2(v, axes=(1, 2))  # (B, H, W//2+1, C)
            out_hat = jnp.zeros(
                (b, h, w // 2 + 1, self.out_channels), dtype=v_hat.dtype
            )

            def mul(block, weights_r, weights_i):
                # block: (B, mx, my, C) complex; weights: (mx, my, C, O)
                wcplx = weights_r + 1j * weights_i
                return jnp.einsum("bxyc,xyco->bxyo", block, wcplx)

            out_hat = out_hat.at[:, :mx, :my].set(
                mul(v_hat[:, :mx, :my], wr[0], wi[0])
            )
            out_hat = out_hat.at[:, -mx:, :my].set(
                mul(v_hat[:, -mx:, :my], wr[1], wi[1])
            )
            return jnp.fft.irfft2(out_hat, s=(h, w), axes=(1, 2))

        cx, sx, cy, sy, dbl = _dft_mats(h, w, mx, my)
        # Forward truncated DFT, e^{-iθ} split into real einsums:
        # stage 1 over H: v1 = sum_n v[n] (cos - i sin)
        v1r = jnp.einsum("bnmc,kn->bkmc", v, cx)
        v1i = -jnp.einsum("bnmc,kn->bkmc", v, sx)
        # stage 2 over W (one-sided): v_hat = sum_m v1[m] (cos - i sin)
        vhr = jnp.einsum("bkmc,lm->bklc", v1r, cy) + jnp.einsum(
            "bkmc,lm->bklc", v1i, sy
        )
        vhi = jnp.einsum("bkmc,lm->bklc", v1i, cy) - jnp.einsum(
            "bkmc,lm->bklc", v1r, sy
        )
        # Per-mode complex weight multiply; the two x-frequency corner
        # blocks are rows [0:mx] and [mx:2mx] of the stacked k axis.
        wr_all = jnp.concatenate([wr[0], wr[1]], axis=0)  # (2mx, my, C, O)
        wi_all = jnp.concatenate([wi[0], wi[1]], axis=0)
        o_r = jnp.einsum("bklc,klco->bklo", vhr, wr_all) - jnp.einsum(
            "bklc,klco->bklo", vhi, wi_all
        )
        o_i = jnp.einsum("bklc,klco->bklo", vhr, wi_all) + jnp.einsum(
            "bklc,klco->bklo", vhi, wr_all
        )
        # Inverse: u = Re{ (1/(HW)) Σ dbl_l o e^{+iθx} e^{+iθy} } — exactly
        # what ifft_x ∘ irfft_y computes on the zero-padded spectrum (the
        # one-sided doubling dbl and the dropped imaginary parts of the
        # DC/Nyquist columns match pocketfft's real-output convention).
        scale = dbl.reshape(1, 1, -1, 1) / (h * w)
        o_r = o_r * scale
        o_i = o_i * scale
        a_r = jnp.einsum("bklo,kn->bnlo", o_r, cx) - jnp.einsum(
            "bklo,kn->bnlo", o_i, sx
        )
        a_i = jnp.einsum("bklo,kn->bnlo", o_r, sx) + jnp.einsum(
            "bklo,kn->bnlo", o_i, cx
        )
        return jnp.einsum("bnlo,lm->bnmo", a_r, cy) - jnp.einsum(
            "bnlo,lm->bnmo", a_i, sy
        )


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
