"""Plain MLP PINN backbone (reference: pinnrl/neural_networks/feedforward.py:9-73)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from pinnrl_tpu.models.base import get_activation


class FeedForwardNetwork(nn.Module):
    """MLP with optional LayerNorm and dropout per hidden layer."""

    input_dim: int
    output_dim: int
    hidden_dims: Sequence[int] = (128,) * 7
    activation: str = "tanh"
    dropout: float = 0.0
    layer_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation)
        for width in self.hidden_dims:
            x = nn.Dense(width)(x)
            if self.layer_norm:
                x = nn.LayerNorm()(x)
            x = act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.output_dim)(x)
