"""PDE problem layer: 9 analytic PDEs over a pure-functional base.

``create_pde(config)`` mirrors the reference factory
(reference: pinnrl/pdes/__init__.py:18-50); ``PDE_REGISTRY`` carries display
names (reference: pinnrl/training/train.py:36-55).
"""

from pinnrl_tpu.config import Config
from pinnrl_tpu.pdes.allen_cahn import AllenCahnEquation  # noqa: F401
from pinnrl_tpu.pdes.base import PDE_CLASSES, PDEBase  # noqa: F401
from pinnrl_tpu.pdes.black_scholes import BlackScholesEquation  # noqa: F401
from pinnrl_tpu.pdes.burgers import BurgersEquation  # noqa: F401
from pinnrl_tpu.pdes.cahn_hilliard import CahnHilliardEquation  # noqa: F401
from pinnrl_tpu.pdes.convection import ConvectionEquation  # noqa: F401
from pinnrl_tpu.pdes.heat import HeatEquation  # noqa: F401
from pinnrl_tpu.pdes.kdv import KdVEquation  # noqa: F401
from pinnrl_tpu.pdes.pendulum import PendulumEquation  # noqa: F401
from pinnrl_tpu.pdes.wave import WaveEquation  # noqa: F401

PDE_REGISTRY = {
    "heat": "Heat Equation",
    "heat_2d": "2D Heat Equation",
    "wave": "Wave Equation",
    "burgers": "Burgers Equation",
    "convection": "Convection Equation",
    "kdv": "KdV Equation",
    "allen_cahn": "Allen-Cahn Equation",
    "cahn_hilliard": "Cahn-Hilliard Equation",
    "black_scholes": "Black-Scholes Equation",
    "pendulum": "Pendulum Equation",
}


def create_pde(config: Config) -> PDEBase:
    """Build the PDE problem from a full Config."""
    mode = getattr(config.training, "mode", "forward")
    if mode == "inverse" and not getattr(config.pde, "trainable_parameters", None):
        raise ValueError(
            "inverse mode requires pde.trainable_parameters (use --identify "
            "or set pde.trainable_parameters in the config)"
        )
    return PDEBase.create(config.pde_type, config.pde, config.training)
