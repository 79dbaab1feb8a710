"""Device-mesh data parallelism for PINN training.

The reference has NO distributed support of any kind (SURVEY.md §2.9: no
torch.distributed / NCCL / MPI anywhere). This module adds the TPU-native
scaling path: PINN collocation batches are embarrassingly parallel, so the
natural strategy is a 1-D ``data`` mesh with the batch sharded across
devices and parameters replicated. XLA inserts the gradient ``psum`` over
ICI automatically when the jitted loss reduces a sharded batch against
replicated params — no hand-written collectives needed (the "How to Scale
Your Model" recipe: pick a mesh, annotate shardings, let XLA do the rest).

Usage:
    mesh = make_mesh()                       # all local devices on axis "data"
    trainer = PDETrainer(model, pde, cfg, mesh=mesh)

Inside the trainer's jitted step the sampled batch gets a
``with_sharding_constraint`` on the ``data`` axis; everything else follows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over (up to) n_devices local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for (batch, ...) arrays: split the leading axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh):
    """Sharding for parameters / optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Apply a data-axis sharding constraint to batch arrays inside jit."""
    sh = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.lax.with_sharding_constraint(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k >= n (batch must divide across devices)."""
    return ((n + k - 1) // k) * k
