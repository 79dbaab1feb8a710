"""Legacy-style numerical solver wrappers (reference: pinnrl/numerical_solvers/)."""

from pinnrl_tpu.numerical_solvers.heat_fdm import HeatEquationFDM  # noqa: F401
from pinnrl_tpu.numerical_solvers.spectral import (  # noqa: F401
    SpectralResult,
    build_phase_field_reference,
    interp_trajectory,
    solve_phase_field_1d,
    spinodal_ic,
)
