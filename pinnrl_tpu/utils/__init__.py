"""Utilities: experiment file I/O, logging, plotting."""

from pinnrl_tpu.utils.io import (  # noqa: F401
    save_live_snapshot,
    save_model,
    load_model,
    save_training_metrics,
)
from pinnrl_tpu.utils.logging import setup_logging  # noqa: F401


def generate_collocation_points(key, num_points, domain, time_domain, strategy="uniform"):
    """Standalone sampler helper (reference: pinnrl/utils/utils.py:48-76)."""
    from pinnrl_tpu.sampling import sample_stratified, sample_uniform

    fn = sample_stratified if strategy == "stratified" else sample_uniform
    return fn(key, num_points, domain, time_domain)
