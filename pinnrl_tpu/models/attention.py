"""Self-attention PINN (reference: pinnrl/neural_networks/attention.py:11-183).

As in the reference, attention operates over a length-1 sequence (each
collocation point is its own sequence), so a block degenerates to a gated
MLP — but the full multi-head QKV machinery is kept for capability parity
and for gridded operator inputs. All dense kernels use the reference's
0.02-std normal init (reference: attention.py:158-163).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pinnrl_tpu.models.base import get_activation

_INIT = nn.initializers.normal(0.02)


class SelfAttention(nn.Module):
    hidden_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        # x: (..., hidden). Treat the trailing features as a length-1 sequence.
        head_dim = self.hidden_dim // self.num_heads
        q = nn.Dense(self.hidden_dim, kernel_init=_INIT)(x)
        k = nn.Dense(self.hidden_dim, kernel_init=_INIT)(x)
        v = nn.Dense(self.hidden_dim, kernel_init=_INIT)(x)

        def split(h):
            return h.reshape(h.shape[:-1] + (self.num_heads, 1, head_dim))

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("...hqd,...hkd->...hqk", q, k) / jnp.sqrt(head_dim)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = out.reshape(x.shape[:-1] + (self.hidden_dim,))
        out = nn.Dense(self.hidden_dim, kernel_init=_INIT)(out)
        return nn.LayerNorm()(x + out)


class FeedForwardBlock(nn.Module):
    """4x expansion GELU MLP with residual + LN (reference: attention.py:75-107)."""

    hidden_dim: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        h = nn.Dense(4 * self.hidden_dim, kernel_init=_INIT)(x)
        h = act(h)
        h = nn.Dense(self.hidden_dim, kernel_init=_INIT)(h)
        return nn.LayerNorm()(x + h)


class AttentionNetwork(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dim: int = 124
    num_layers: int = 4
    num_heads: int = 4
    activation: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, kernel_init=_INIT)(x)
        for _ in range(self.num_layers):
            x = SelfAttention(self.hidden_dim, self.num_heads)(x)
            x = FeedForwardBlock(self.hidden_dim, self.activation)(x)
        return nn.Dense(self.output_dim, kernel_init=_INIT)(x)
