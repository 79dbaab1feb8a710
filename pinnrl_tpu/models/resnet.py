"""Residual MLP (reference: pinnrl/neural_networks/resnet.py:9-142).

Block structure mirrors the reference: Dense -> LN -> act -> Dropout ->
Dense -> LN -> Dropout, combined as ``act(x + F(x))``.
"""

from __future__ import annotations

import flax.linen as nn

from pinnrl_tpu.models.base import get_activation


class ResNetBlock(nn.Module):
    hidden_dim: int
    activation: str = "tanh"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation)
        h = nn.Dense(self.hidden_dim)(x)
        h = nn.LayerNorm()(h)
        h = act(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.LayerNorm()(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return act(x + h)


class ResNet(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dim: int = 512
    num_blocks: int = 7
    activation: str = "tanh"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim)(x)
        x = get_activation(self.activation)(x)
        for _ in range(self.num_blocks):
            x = ResNetBlock(self.hidden_dim, self.activation, self.dropout)(
                x, deterministic=deterministic
            )
        return nn.Dense(self.output_dim)(x)
