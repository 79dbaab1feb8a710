"""Shared model utilities: activation registry, parameter counting, save/load.

TPU-native counterpart of the reference's ``BaseNetwork``
(reference: pinnrl/neural_networks/base_network.py:15-104). There is no
device handling here — params are pytrees placed by jit/sharding — and
state save/load uses flax's msgpack serialization instead of torch.save.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import serialization

ACTIVATIONS: Dict[str, Callable] = {
    "tanh": jnp.tanh,
    "relu": nn.relu,
    "gelu": nn.gelu,
    "sigmoid": nn.sigmoid,
    "silu": nn.silu,
    "swish": nn.silu,
    "sin": jnp.sin,
    "elu": nn.elu,
    "leaky_relu": nn.leaky_relu,
    "softplus": nn.softplus,
}


def get_activation(name: str) -> Callable:
    """Activation-name -> function map (reference: base_network.py:91-104)."""
    try:
        return ACTIVATIONS[name.lower()]
    except KeyError as exc:
        raise ValueError(
            f"Unknown activation {name!r}; valid: {sorted(ACTIVATIONS)}"
        ) from exc


def count_parameters(params: Any) -> int:
    """Total trainable scalars in a parameter pytree (reference: base_network.py:79-81)."""
    return int(sum(x.size for x in jax.tree_util.tree_leaves(params)))


def save_state(path: str | Path, params: Any, config: Dict[str, Any] | None = None) -> None:
    """Serialize params (+ config sidecar) — analog of reference save_state
    (reference: base_network.py:60-77)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(params))
    if config is not None:
        path.with_suffix(".json").write_text(json.dumps(config, indent=2, default=str))


def load_state(path: str | Path, params_template: Any) -> Any:
    """Deserialize params into the structure of ``params_template``."""
    return serialization.from_bytes(params_template, Path(path).read_bytes())
