"""Fused SIREN layer: sin(omega_0 * (x @ W + b)) in one Pallas kernel.

Like the Fourier-feature kernel, this sits inside the PINN residual path, so
it carries an analytic ``custom_jvp``: the tangent of sin is cos of the SAME
pre-activation, expressed via the primal output's phase (cos = sqrt safe? no
— we recompute cos from the pre-activation, which the jvp rule re-derives
with standard ops so arbitrary-order nesting works).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _siren_kernel(x_ref, w_ref, b_ref, out_ref, *, omega: float):
    pre = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]
    out_ref[:] = jnp.sin(omega * pre)


def _pallas_siren(x, W, b, omega):
    n, d = x.shape
    m = W.shape[1]
    block_n = min(512, max(8, n))
    return pl.pallas_call(
        partial(_siren_kernel, omega=omega),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, W, b)


@partial(jax.custom_jvp, nondiff_argnums=(3,))
def siren_layer(x: jax.Array, W: jax.Array, b: jax.Array, omega: float = 30.0):
    """sin(omega * (x @ W + b)); Pallas on TPU for 2D tile-aligned inputs."""
    if (
        jax.default_backend() in ("tpu", "axon")
        and x.ndim == 2
        and x.shape[0] >= 8
        and W.shape[1] % 128 == 0
        # f32 only: the X64 rewriting pass cannot rewrite custom-calls.
        and x.dtype == jnp.float32
        and W.dtype == jnp.float32
    ):
        try:
            return _pallas_siren(x, W, b, omega)
        except Exception:
            pass
    return jnp.sin(omega * (x @ W + b))


@siren_layer.defjvp
def _siren_layer_jvp(omega, primals, tangents):
    x, W, b = primals
    dx, dW, db = tangents
    out = siren_layer(x, W, b, omega)  # primal via the fused kernel
    # cos of the pre-activation in standard ops so higher orders recurse.
    pre = x @ W + b
    dpre = dx @ W + x @ dW + db
    return out, jnp.cos(omega * pre) * (omega * dpre)
