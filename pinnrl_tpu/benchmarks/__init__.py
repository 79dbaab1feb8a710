"""Benchmarks: FDM baselines + sampling-strategy harness + CLI."""

from pinnrl_tpu.benchmarks.fdm import FDMResult, solve_heat_1d, solve_wave_1d  # noqa: F401
from pinnrl_tpu.benchmarks.sampling import (  # noqa: F401
    SamplingResult,
    run_sampling_benchmark,
)
