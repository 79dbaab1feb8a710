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

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first TPU compiles of the fused
    training step can take minutes over a remote-TPU link; repeats are
    instant. Opt out with PINNRL_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("PINNRL_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "pinnrl_tpu", "jax_cache"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _set_matmul_precision() -> None:
    """Default matmul precision -> float32 ("highest").

    TPU matmuls default to bf16 accumulation under jit. PINN training is
    precision-critical: with Fourier features the phases reach tens of
    radians, and late-stage optimization literally tunes the network into
    the compiled bf16 numerics — the resulting function evaluates to
    something else entirely at f32 (observed: IC loss 1e-4 inside the jitted
    step vs 0.39 recomputed at f32 on identical params; SURVEY.md risk #6).
    Override with PINNRL_TPU_MATMUL_PRECISION=default|high|highest.
    """
    try:
        import jax

        prec = _os.environ.get("PINNRL_TPU_MATMUL_PRECISION", "highest")
        if prec != "default":
            jax.config.update("jax_default_matmul_precision", prec)
    except Exception:
        pass


_enable_compilation_cache()
_set_matmul_precision()

from pinnrl_tpu.config import Config  # noqa: F401
