"""Utilities: experiment file I/O, logging, plotting."""

from pinnrl_tpu.utils.io import (  # noqa: F401
    save_live_snapshot,
    save_model,
    load_model,
    save_training_metrics,
)
from pinnrl_tpu.utils.logging import setup_logging  # noqa: F401
