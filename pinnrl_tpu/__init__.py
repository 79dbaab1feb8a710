"""pinnrl_tpu — TPU-native Physics-Informed Neural Networks with RL-driven sampling.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
josegarciav/PINNs-RL-PDE (``pinnrl``): 9 analytic PDE problems, 7 neural
architectures, adaptive collocation sampling (uniform / stratified / RAR /
on-device DQN), forward & inverse training, "The Well" dataset integration,
FDM baselines, a benchmark CLI, and a file-protocol experiment dashboard —
all designed TPU-first:

- PDE residuals are pure point-wise functions differentiated with
  forward-mode (nested ``jax.jvp`` / Taylor-mode ``jax.experimental.jet``)
  AD and ``vmap``-ed over the collocation batch, so the whole residual
  evaluation compiles to batched MXU matmuls.
- The training step (sample -> loss -> grad -> update) is one jitted XLA
  program scanned over steps with ``jax.lax.scan``.
- The DQN sampling agent's replay buffer, Q-update and epsilon-greedy
  action live entirely on device as fixed-shape pytrees.
- Scaling is ``jax.sharding`` over a device mesh: the collocation batch is
  sharded across the ``data`` axis and gradients reduce over ICI.
"""

__version__ = "0.1.0"

from pinnrl_tpu.config import Config  # noqa: F401
