"""Core numerical ops: forward-mode derivative engine, loss reductions, Pallas kernels."""

from pinnrl_tpu.ops.derivatives import (  # noqa: F401
    derivative_bundle,
    directional_derivative,
    laplacian,
    make_scalar_fn,
)
from pinnrl_tpu.ops.losses import apply_loss_fn  # noqa: F401
