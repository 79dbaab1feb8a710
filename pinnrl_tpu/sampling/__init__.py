"""Collocation-point sampling strategies (pure functions of a PRNG key)."""

from pinnrl_tpu.sampling.strategies import (  # noqa: F401
    sample_adaptive,
    sample_residual_based,
    sample_stratified,
    sample_uniform,
)
