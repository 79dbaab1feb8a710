"""Model factory (reference: pinnrl/neural_networks/__init__.py:61-154).

``PINNModel`` dispatches on ``config.model.architecture`` and wraps a flax
module together with its initialized variables. Trainable parameters (the
``params`` collection) are exposed separately from fixed constants (e.g. the
Fourier-feature projection matrix — the ``constants`` collection) so the
optimizer sees only trainables and the pure ``apply(params, x)`` closure can
be jitted/vmapped/differentiated freely.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from pinnrl_tpu.config import Config, ModelConfig
from pinnrl_tpu.models.attention import AttentionNetwork
from pinnrl_tpu.models.autoencoder import AutoEncoder
from pinnrl_tpu.models.base import count_parameters, load_state, save_state
from pinnrl_tpu.models.feedforward import FeedForwardNetwork
from pinnrl_tpu.models.fno import FNONetwork
from pinnrl_tpu.models.fourier import FourierNetwork
from pinnrl_tpu.models.resnet import ResNet
from pinnrl_tpu.models.siren import SIREN

__all__ = [
    "PINNModel",
    "create_module",
    "FeedForwardNetwork",
    "ResNet",
    "SIREN",
    "FourierNetwork",
    "FNONetwork",
    "AttentionNetwork",
    "AutoEncoder",
    "count_parameters",
    "save_state",
    "load_state",
]


def _parse_scale(v):
    """Fourier-feature scale: float, or per-input-dim sequence (anisotropic);
    also accepts a colon-separated string like "0:1.0" from CLI overrides."""
    if isinstance(v, str):
        parts = v.split(":")
        return tuple(float(p) for p in parts) if len(parts) > 1 else float(v)
    if isinstance(v, (list, tuple)):
        return tuple(float(p) for p in v)
    return float(v)


def create_module(model_cfg: ModelConfig):
    """Build the flax module for a ModelConfig."""
    arch = model_cfg.architecture
    ap = model_cfg.arch_params
    common = dict(input_dim=model_cfg.input_dim, output_dim=model_cfg.output_dim)

    if arch == "feedforward":
        return FeedForwardNetwork(
            hidden_dims=tuple(model_cfg.hidden_dims),
            activation=model_cfg.activation,
            dropout=model_cfg.dropout,
            layer_norm=model_cfg.layer_norm,
            **common,
        )
    if arch == "resnet":
        return ResNet(
            hidden_dim=model_cfg.hidden_dim,
            num_blocks=model_cfg.num_blocks,
            activation=model_cfg.activation,
            dropout=model_cfg.dropout,
            **common,
        )
    if arch == "siren":
        return SIREN(
            hidden_dims=tuple(model_cfg.hidden_dims),
            omega_0=float(ap.get("omega_0", 30.0)),
            **common,
        )
    if arch == "fourier":
        return FourierNetwork(
            hidden_dims=tuple(model_cfg.hidden_dims),
            mapping_size=int(ap.get("mapping_size", 512)),
            scale=_parse_scale(ap.get("scale", 4.0)),
            periodic=bool(ap.get("periodic", True)),
            modified=bool(ap.get("modified", False)),
            feature_seed=(
                int(ap["feature_seed"]) if ap.get("feature_seed") is not None else None
            ),
            trainable_features=bool(ap.get("trainable_features", False)),
            activation=model_cfg.activation,
            dropout=model_cfg.dropout,
            layer_norm=model_cfg.layer_norm,
            **common,
        )
    if arch == "fno":
        return FNONetwork(
            hidden_dim=int(ap.get("hidden_dim", 256)),
            num_blocks=int(ap.get("num_blocks", 4)),
            modes=int(ap.get("modes", 16)),
            activation=model_cfg.activation if model_cfg.activation != "tanh" else "gelu",
            dropout=model_cfg.dropout,
            **common,
        )
    if arch == "attention":
        return AttentionNetwork(
            hidden_dim=int(ap.get("hidden_dim", 124)),
            num_layers=int(ap.get("num_layers", ap.get("num_blocks", 4))),
            num_heads=int(ap.get("num_heads", 4)),
            activation=model_cfg.activation if model_cfg.activation != "tanh" else "gelu",
            dropout=model_cfg.dropout,
            **common,
        )
    if arch == "autoencoder":
        return AutoEncoder(
            hidden_dims=tuple(model_cfg.hidden_dims),
            latent_dim=int(ap.get("latent_dim", 64)),
            activation=model_cfg.activation,
            dropout=model_cfg.dropout,
            layer_norm=model_cfg.layer_norm,
            **common,
        )
    raise ValueError(f"Unknown architecture {arch!r}")


class PINNModel:
    """Architecture factory + pure apply wrapper (reference: neural_networks/__init__.py:61-154).

    Inputs are affinely normalized from the PDE domain to [-1, 1]^d before the
    network (SIREN/Fourier features expect unit-scale inputs, and it removes
    the degenerate all-zero first-layer activation at domain corners that
    makes LayerNorm derivatives blow up). Derivatives w.r.t. physical
    coordinates flow through the affine map via the chain rule automatically.
    """

    def __init__(self, config: Config | ModelConfig, rng: Optional[jax.Array] = None, seed: int = 0):
        model_cfg = config.model if isinstance(config, Config) else config
        self.config = model_cfg
        self.architecture_name = model_cfg.architecture
        self.module = create_module(model_cfg)

        # Input normalization bounds from the PDE domain (identity fallback).
        if isinstance(config, Config):
            lo = [d[0] for d in config.pde.domain] + [config.pde.time_domain[0]]
            hi = [d[1] for d in config.pde.domain] + [config.pde.time_domain[1]]
        else:
            lo = [0.0] * model_cfg.input_dim
            hi = [1.0] * model_cfg.input_dim
        self._in_lo = jnp.asarray(lo, jnp.float32)
        self._in_scale = 2.0 / (jnp.asarray(hi, jnp.float32) - self._in_lo)

        # Co-moving-frame preconditioning (new capability beyond the
        # reference): arch_params.moving_frame_speed = c maps physical
        # inputs (x, t) -> (x - c t, t) before normalization and the
        # network. An invertible linear change of coordinates — no
        # information is lost, and derivatives w.r.t. physical coordinates
        # flow through the chain rule automatically — but the network then
        # represents the solution in the frame where a traveling structure
        # (KdV soliton, Burgers shock at speed c from the PDE coefficients)
        # is near-steady: the standard characteristic-embedding trick for
        # advection-dominated PINNs. Architecture-agnostic; the last input
        # column is time, matching the PDE base's (x_0..x_{d-1}, t) layout.
        mf = model_cfg.arch_params.get("moving_frame_speed")
        self._frame_speed = float(mf) if mf is not None else None

        # Optional output transform u(z) = g(z, net(z)) applied in PHYSICAL
        # coordinates after the network (new capability beyond the
        # reference). The canonical use is hard initial-condition
        # imposition, u = u0(x) + tanh(t/T) * net(x, t), which satisfies the
        # IC exactly by construction — the standard fix when the dominant
        # error mode is IC-seeded and amplified over the time horizon
        # (dispersive PDEs like KdV). Must be a pure jax function; it is
        # traced into every jitted loss/residual since PINNModel.apply is
        # the single forward choke point, and derivatives w.r.t. physical
        # coordinates flow through it automatically.
        self.output_transform: Optional[Callable] = None

        rng = rng if rng is not None else jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, model_cfg.input_dim), jnp.float32)
        variables = self.module.init(rng, dummy)
        self.constants: Dict[str, Any] = {
            k: v for k, v in variables.items() if k != "params"
        }
        self.params = variables["params"]
        # ndim of a single-member parameter leaf: an ensemble-stacked pytree
        # (training.ensemble_size > 1) has every leaf one axis deeper, which
        # is how ``apply`` recognizes it (see is_ensemble_params).
        self._single_leaf_ndim = jax.tree_util.tree_leaves(self.params)[0].ndim

    def is_ensemble_params(self, params) -> bool:
        """True when ``params`` is a stacked deep-ensemble pytree (leading
        member axis on every leaf), as produced by PDETrainer with
        ``training.ensemble_size > 1``."""
        leaves = jax.tree_util.tree_leaves(params)
        return bool(leaves) and leaves[0].ndim == self._single_leaf_ndim + 1

    def apply(self, params, x, deterministic: bool = True):
        """Pure forward pass: ``x`` is (..., input_dim); works point-wise or batched."""
        z = x
        if self._frame_speed is not None:
            xs, t = x[..., :-1], x[..., -1:]
            x = jnp.concatenate([xs - self._frame_speed * t, t], axis=-1)
        x = (x - self._in_lo) * self._in_scale - 1.0
        if self.is_ensemble_params(params):
            # Deep-ensemble prediction: mean over the stacked member axis.
            # Members were trained independently (see PDETrainer); the mean
            # predictor averages out decorrelated per-init error fields.
            out = jnp.mean(
                jax.vmap(
                    lambda p: self.module.apply(
                        {"params": p, **self.constants}, x, deterministic=deterministic
                    )
                )(params),
                axis=0,
            )
        else:
            out = self.module.apply(
                {"params": params, **self.constants}, x, deterministic=deterministic
            )
        if self.output_transform is not None:
            out = self.output_transform(z, out)
        return out

    def __call__(self, x):
        return self.apply(self.params, x)

    def count_parameters(self) -> int:
        return count_parameters(self.params)

    def save_state(self, path: str) -> None:
        from pinnrl_tpu.config import _asdict

        save_state(
            path,
            {"params": self.params, **self.constants},
            config=_asdict(self.config),
        )

    def load_state(self, path: str) -> None:
        template = {"params": self.params, **self.constants}
        restored = load_state(path, template)
        self.params = restored["params"]
        self.constants = {k: v for k, v in restored.items() if k != "params"}
