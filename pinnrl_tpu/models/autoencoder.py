"""Autoencoder used as a PINN function approximator
(reference: pinnrl/neural_networks/autoencoder.py:9-100): encoder maps
coordinates to a latent code, decoder maps the code to the solution value.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from pinnrl_tpu.models.base import get_activation


class AutoEncoder(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dims: Sequence[int] = (124, 248, 124)
    latent_dim: int = 64
    activation: str = "relu"
    dropout: float = 0.0
    layer_norm: bool = True

    def setup(self):
        act = self.activation
        self.encoder_layers = [nn.Dense(w) for w in self.hidden_dims]
        self.encoder_norms = (
            [nn.LayerNorm() for _ in self.hidden_dims] if self.layer_norm else None
        )
        self.to_latent = nn.Dense(self.latent_dim)
        self.decoder_layers = [nn.Dense(w) for w in reversed(self.hidden_dims)]
        self.decoder_norms = (
            [nn.LayerNorm() for _ in self.hidden_dims] if self.layer_norm else None
        )
        self.to_output = nn.Dense(self.output_dim)
        self._act = get_activation(act)

    def encode(self, x):
        for i, layer in enumerate(self.encoder_layers):
            x = layer(x)
            if self.encoder_norms is not None:
                x = self.encoder_norms[i](x)
            x = self._act(x)
        return self.to_latent(x)

    def decode(self, z):
        for i, layer in enumerate(self.decoder_layers):
            z = layer(z)
            if self.decoder_norms is not None:
                z = self.decoder_norms[i](z)
            z = self._act(z)
        return self.to_output(z)

    def __call__(self, x, deterministic: bool = True):
        return self.decode(self.encode(x))
