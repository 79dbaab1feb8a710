"""Parallelism over TPU device meshes (new capability — the reference is
strictly single-device, see SURVEY.md §2.9)."""

from pinnrl_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
