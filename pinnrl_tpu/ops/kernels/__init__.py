"""Pallas TPU kernels for hot ops.

Design note: the PINN residual path is differentiated with *nested
forward-mode* AD (orders up to 4), so kernels that sit inside it must carry
analytic ``custom_jvp`` rules — see ``fourier_feats``. Forward-only paths
(DQN grid scoring, validation/snapshot inference) can use plain kernels —
see ``mlp``. Everything is flag-gated with an XLA fallback: XLA already
fuses elementwise ops into matmuls, so each kernel must *win a benchmark*
to earn its place (see tests/test_kernels.py and bench comments).
"""

from pinnrl_tpu.ops.kernels.fourier_feats import fourier_features  # noqa: F401
from pinnrl_tpu.ops.kernels.mlp import fused_mlp_score  # noqa: F401
from pinnrl_tpu.ops.kernels.siren import siren_layer  # noqa: F401
