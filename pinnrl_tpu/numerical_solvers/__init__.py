"""Legacy-style numerical solver wrappers (reference: pinnrl/numerical_solvers/)."""

from pinnrl_tpu.numerical_solvers.heat_fdm import HeatEquationFDM  # noqa: F401
