"""Training layer: trainer, adaptive weights, CLI."""

from pinnrl_tpu.training.adaptive_weights import (  # noqa: F401
    AdaptiveLossWeights,
    AdaptiveWeightState,
)
from pinnrl_tpu.training.multistage import (  # noqa: F401
    MultiStageResult,
    StageSpec,
    correction_model,
    run_multistage,
)
from pinnrl_tpu.training.trainer import PDETrainer  # noqa: F401
