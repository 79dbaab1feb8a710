"""Fourier-feature network (reference: pinnrl/neural_networks/fourier.py:19-124).

A fixed random projection ``B ~ N(0, scale^2)`` embeds coordinates as
``[sin(x B), cos(x B)]`` (optionally with a 2*pi periodic factor), followed
by an MLP. ``B`` is a non-trainable variable (flax "constants" collection),
the analog of the reference's registered buffer.

The embedding is a single matmul + sin/cos — XLA fuses it straight into the
first MXU matmul of the MLP; a Pallas fused variant lives in
``pinnrl_tpu.ops.kernels.fourier_feats`` for the hot path.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pinnrl_tpu.models.base import get_activation


class FourierFeatures(nn.Module):
    mapping_size: int = 512
    # Isotropic float, or a per-input-dimension tuple (anisotropic random
    # Fourier features, the "spatio-temporal multi-scale" form of Wang,
    # Wang & Perdikaris 2021): row i of B is drawn N(0, scale[i]^2).
    # scale[i] = 0 makes the embedding EXACTLY independent of coordinate i
    # — the right basis for ODE-as-PDE problems (pendulum) whose solution
    # is constant along the dummy spatial axis, where an isotropic basis
    # measurably leaks spurious x-dependence near the domain edges
    # (rel-L2 floor 1.8e-3, error concentrated at the x boundary).
    scale: float | tuple = 4.0
    periodic: bool = True
    # When set, the random projection B is drawn from this dedicated seed
    # instead of the model init rng. The feature basis is an architecture
    # hyperparameter (it is never trained); pinning it makes multi-seed
    # robustness runs vary ONLY the trainable init and batch draws, not the
    # frequency coverage — on KdV the basis lottery alone swings rel-L2
    # 3.7e-3 <-> 2.8e-2 across seeds.
    feature_seed: int | None = None
    # Trainable basis: B lives in the "params" collection and receives
    # gradients, so optimization can move frequency coverage to where the
    # solution needs it instead of gambling on the init lottery. Also the
    # hook for per-member basis diversity in deep ensembles (each member's
    # init rng draws its own B when feature_seed is None).
    trainable: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]

        def _draw(rng):
            s = jnp.asarray(self.scale, jnp.float32)
            if s.ndim == 1 and s.shape[0] != in_dim:
                raise ValueError(
                    f"anisotropic scale needs {in_dim} entries, got {s.shape[0]}"
                )
            if s.ndim == 1:
                s = s[:, None]  # broadcast per input dimension (row of B)
            return s * jax.random.normal(
                jax.random.PRNGKey(self.feature_seed)
                if self.feature_seed is not None
                else rng,
                (in_dim, self.mapping_size),
            )

        if self.trainable:
            B = self.param("B", _draw)
        else:
            B = self.variable(
                "constants", "B", lambda: _draw(self.make_rng("params"))
            ).value
        if x.ndim == 2:
            # Fused Pallas kernel (projection + sin/cos in one VMEM pass)
            # with an analytic custom_jvp for the nested-AD residual path.
            from pinnrl_tpu.ops.kernels.fourier_feats import fourier_features

            return fourier_features(x, B, self.periodic)
        proj = x @ B
        if self.periodic:
            proj = 2.0 * jnp.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class FourierNetwork(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dims: Sequence[int] = (512,) * 4
    mapping_size: int = 512
    scale: float | tuple = 4.0  # float or per-dim tuple, see FourierFeatures
    periodic: bool = True
    activation: str = "tanh"
    dropout: float = 0.0
    layer_norm: bool = True
    # Modified-MLP trunk (Wang, Teng & Perdikaris 2021, "Understanding and
    # mitigating gradient flow pathologies in PINNs", eq. 3.14): two
    # encoder streams U, V of the embedded input gate every hidden layer,
    # H_{k+1} = (1 - Z_k) * U + Z_k * V. The standard fix for stiff-PINN
    # optimization plateaus; all hidden widths must match. Enable with
    # arch_params["modified"] = true. New capability beyond the reference.
    modified: bool = False
    feature_seed: int | None = None  # see FourierFeatures.feature_seed
    trainable_features: bool = False  # see FourierFeatures.trainable

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation)
        x = FourierFeatures(
            self.mapping_size, self.scale, self.periodic,
            feature_seed=self.feature_seed,
            trainable=self.trainable_features,
        )(x)
        if self.modified:
            widths = set(self.hidden_dims)
            if len(widths) != 1:
                raise ValueError(
                    f"modified MLP needs uniform hidden widths, got {self.hidden_dims}"
                )
            width = self.hidden_dims[0]
            u = act(nn.Dense(width, name="enc_u")(x))
            v = act(nn.Dense(width, name="enc_v")(x))
            h = x
            for i in range(len(self.hidden_dims)):
                z = nn.Dense(width, name=f"gate_{i}")(h)
                if self.layer_norm:
                    z = nn.LayerNorm()(z)
                z = act(z)
                if self.dropout > 0:
                    z = nn.Dropout(self.dropout, deterministic=deterministic)(z)
                h = (1.0 - z) * u + z * v
            return nn.Dense(self.output_dim)(h)
        for width in self.hidden_dims:
            x = nn.Dense(width)(x)
            if self.layer_norm:
                x = nn.LayerNorm()(x)
            x = act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.output_dim)(x)
