"""Fused Fourier-feature embedding: [sin(2*pi*x@B), cos(2*pi*x@B)].

One Pallas kernel computes the projection matmul and both trig maps in a
single VMEM pass (the XLA path materializes the projection then applies two
elementwise ops). Because this op sits inside the PINN residual path, it
carries an analytic ``jax.custom_jvp`` rule — the tangent is expressed with
the same fused kernel outputs (cos/-sin phase rotation), so arbitrarily
nested forward-mode derivatives (heat needs 2, KdV 3, Cahn-Hilliard 4) keep
working and stay fused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ff_kernel(x_ref, b_ref, out_ref, *, two_pi: bool):
    proj = jnp.dot(x_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    if two_pi:
        proj = (2.0 * jnp.pi) * proj
    m = b_ref.shape[1]
    out_ref[:, :m] = jnp.sin(proj)
    out_ref[:, m:] = jnp.cos(proj)


def _pallas_ff(x: jax.Array, B: jax.Array, two_pi: bool) -> jax.Array:
    n, d = x.shape
    m = B.shape[1]
    block_n = min(512, max(8, n))
    grid = (pl.cdiv(n, block_n),)
    return pl.pallas_call(
        partial(_ff_kernel, two_pi=two_pi),
        out_shape=jax.ShapeDtypeStruct((n, 2 * m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 2 * m), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, B)


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def fourier_features(x: jax.Array, B: jax.Array, two_pi: bool = True) -> jax.Array:
    """[sin(s*x@B), cos(s*x@B)] with s = 2*pi (optional). x: (N, d), B: (d, m).

    Pallas on TPU; jnp fallback elsewhere / for odd shapes.
    """
    if (
        jax.default_backend() in ("tpu", "axon")
        and x.ndim == 2
        and x.shape[0] >= 8
        and B.shape[1] % 128 == 0
        # f32 only: XLA's X64 rewriting pass cannot rewrite custom-calls, so
        # an f64 polish phase must take the jnp path.
        and x.dtype == jnp.float32
        and B.dtype == jnp.float32
    ):
        try:
            return _pallas_ff(x, B, two_pi)
        except Exception:
            pass
    proj = x @ B
    if two_pi:
        proj = 2.0 * jnp.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


@fourier_features.defjvp
def _fourier_features_jvp(two_pi, primals, tangents):
    """Analytic tangent: d[sin, cos] = [cos, -sin] * s * d(x@B).

    Written in terms of the primal output's phase shift, so higher-order
    forward derivatives recurse through the same closed form.
    """
    x, B = primals
    dx, dB = tangents
    out = fourier_features(x, B, two_pi)
    m = B.shape[-1]
    s = 2.0 * jnp.pi if two_pi else 1.0
    dproj = s * (dx @ B + x @ dB)
    sin_part, cos_part = out[..., :m], out[..., m:]
    dout = jnp.concatenate([cos_part * dproj, -sin_part * dproj], axis=-1)
    return out, dout
