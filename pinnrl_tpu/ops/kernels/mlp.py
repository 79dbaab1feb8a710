"""Fused MLP scorer kernel: Dense -> LayerNorm -> ReLU (x2) -> Dense(1).

This is the DQN agent's grid-scoring network (reference: rl_agent.py:15-88)
evaluated over the adaptive sampler's ~10k-point grid every step — a pure
forward pass (scores feed a categorical sample, no gradient flows through),
so it can be one Pallas kernel: all three matmuls + both LayerNorms + ReLUs
in a single VMEM residency per row block, instead of 8 XLA ops with HBM
round-trips between fusion islands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, w1_ref, b1_ref, g1_ref, be1_ref, w2_ref, b2_ref,
                g2_ref, be2_ref, w3_ref, b3_ref, out_ref, *, eps: float):
    def dense_ln_relu(h, w_ref, b_ref, g_ref, be_ref):
        y = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + be_ref[:]
        return jnp.maximum(y, 0.0)

    h = dense_ln_relu(x_ref[:], w1_ref, b1_ref, g1_ref, be1_ref)
    h = dense_ln_relu(h, w2_ref, b2_ref, g2_ref, be2_ref)
    out_ref[:] = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]


def fused_mlp_score(x: jax.Array, params: dict, eps: float = 1e-6) -> jax.Array:
    """Score a (N, d) point grid with a DQNNetwork parameter pytree.

    ``params`` is the flax param dict of ``pinnrl_tpu.rl.dqn.DQNNetwork``
    (Dense_0 / LayerNorm_0 / Dense_1 / LayerNorm_1 / Dense_2). Returns
    (N, action_dim). Falls back to plain jnp off-TPU or for tiny grids.
    """
    w1, b1 = params["Dense_0"]["kernel"], params["Dense_0"]["bias"]
    g1, be1 = params["LayerNorm_0"]["scale"], params["LayerNorm_0"]["bias"]
    w2, b2 = params["Dense_1"]["kernel"], params["Dense_1"]["bias"]
    g2, be2 = params["LayerNorm_1"]["scale"], params["LayerNorm_1"]["bias"]
    w3, b3 = params["Dense_2"]["kernel"], params["Dense_2"]["bias"]

    n, d = x.shape
    h = w1.shape[1]
    use_pallas = (
        jax.default_backend() in ("tpu", "axon")
        and n >= 256
        and h % 128 == 0
        # f32 only: the X64 rewriting pass cannot rewrite custom-calls.
        and x.dtype == jnp.float32
        and w1.dtype == jnp.float32
    )
    if not use_pallas:
        def dlr(z, w, b, g, be):
            y = z @ w + b
            mean = y.mean(-1, keepdims=True)
            var = ((y - mean) ** 2).mean(-1, keepdims=True)
            return jnp.maximum((y - mean) * jax.lax.rsqrt(var + eps) * g + be, 0.0)

        z = dlr(x, w1, b1, g1, be1)
        z = dlr(z, w2, b2, g2, be2)
        return z @ w3 + b3

    block_n = 512
    grid = (pl.cdiv(n, block_n),)
    out_dim = w3.shape[1]
    full = lambda *shape: [
        pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    ][0]
    return pl.pallas_call(
        partial(_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(d, h), full(h), full(h), full(h),
            full(h, h), full(h), full(h), full(h),
            full(h, out_dim), full(out_dim),
        ],
        out_specs=pl.BlockSpec((block_n, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3)
