"""Stacked-stream Taylor-jet evaluation of the Fourier-features MLP.

The generic residual path evaluates the network as a per-point scalar
function and differentiates it with nested ``jax.jvp`` / ``jet`` under
``vmap`` (``pinnrl_tpu.ops.derivatives``). That is fully general, but each
derivative stream then rides its own chain of small matmuls: a k-th-order
bundle costs up to 2^k primal-equivalents (nested jvp) or k+1 *separate*
per-coefficient matmuls (jet), all issued as independent MXU ops.

This module exploits the structure of the Fourier-MLP instead:

- A Dense layer is **linear**, so every directional-derivative stream is
  transported by the *same* weight matrix. All streams are stacked along the
  batch axis and transported by ONE ``(S*N, n) @ (n, m)`` matmul per layer —
  the MXU sees one large tile instead of S small ones, and the weight matrix
  is read once per layer instead of once per stream.
- The nonlinear blocks (LayerNorm + activation) are elementwise/row-wise
  (VPU work, no weights); their streams are transported by Taylor-mode
  composition (`jax.experimental.jet`), i.e. Faa di Bruno up to the needed
  order, with no network re-evaluation.
- The Fourier embedding's streams are closed-form: the input map is affine,
  so directional derivatives of ``[sin(xB), cos(xB)]`` are phase rotations
  scaled by powers of the (constant) projected direction.

The result is a function ``(params, z) -> (value, {axis: [d1..dk]})`` over
the whole batch, computing exactly what ``derivative_bundle`` computes but
as L stacked matmuls + O(k^2) VPU ops. It is built from the model *config +
parameter tree* (structural), not the black-box apply, and is reverse-mode
differentiable (jet emits standard primitives), so training losses can sit
on top unchanged.

Reference parity note: this accelerates the same quantities the reference
produces with repeated ``torch.autograd.grad`` chains
(reference: pinnrl/pdes/pde_base.py:590-794); there is no torch counterpart
of the stacked transport — it is a TPU/MXU-shaped design.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pinnrl_tpu.models.base import get_activation

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


class BundleView:
    """Point-function stand-in backed by precomputed derivative streams.

    ``residual_pointwise`` implementations written against the trio
    ``u(z)`` / ``directional_derivative(u, z, axis, order)`` /
    ``laplacian(u, z, axes)`` evaluate unchanged against a BundleView:
    the derivative-engine entry points detect it and return the
    precomputed streams instead of differentiating (see
    ``pinnrl_tpu.ops.derivatives``). Scalars per point — construct inside
    a ``vmap`` over the batched streams.
    """

    def __init__(self, value: jax.Array, streams: Dict[int, List[jax.Array]]):
        self.value = value
        self.streams = streams

    def __call__(self, z: jax.Array) -> jax.Array:  # noqa: ARG002 — parity
        return self.value

    def directional(self, axis: int, order: int) -> List[jax.Array]:
        per_axis = self.streams.get(axis)
        if per_axis is None or len(per_axis) < order:
            raise KeyError(
                f"BundleView has no order-{order} stream for axis {axis}; "
                f"available: { {a: len(s) for a, s in self.streams.items()} }. "
                "Declare the orders in the PDE's spatial_orders/temporal_orders."
            )
        return per_axis[:order]


def _tree(params, *path):
    node = params
    for p in path:
        node = node[p]
    return node


def supports(model, pde=None) -> bool:
    """True when ``make_bundle_fn`` can evaluate this model structurally."""
    cfg = model.config
    if cfg.architecture not in ("fourier", "feedforward"):
        return False
    if bool(cfg.arch_params.get("modified", False)):
        return False
    if model.output_transform is not None:
        return False
    if cfg.activation.lower() not in ("tanh", "gelu", "sigmoid", "silu", "swish",
                                      "sin", "softplus"):
        # relu/leaky_relu/elu kinks have no meaningful higher-order jets.
        return False
    return True


def _transport_block(
    h0: jax.Array,
    groups: List[List[jax.Array]],
    gamma: Optional[jax.Array],
    beta: Optional[jax.Array],
    act_name: str,
):
    """Hand-rolled Taylor transport of [LayerNorm ->] tanh for orders <= 3.

    One fused set of VPU formulas shared across ALL direction groups: the
    LayerNorm statistics streams and the tanh derivative factors are
    computed once, where the generic path (one ``jet.jet`` call per group)
    recomputes them per group. Returns (a0, groups_out).

    LayerNorm streams (c = h - mean(h), var = mean(c^2), s = sqrt(var+eps),
    q = c/s): differentiating s^2 = var + eps and c = q s repeatedly gives
        s1 = var1 / (2 s0)
        s2 = (var2 - 2 s1^2) / (2 s0)
        s3 = (var3 - 6 s1 s2) / (2 s0)
        q_k = (c_k - sum_{j<k} C(k,j) q_j s_{k-j}) / s0      (Leibniz)
    tanh streams (a = tanh(y), d1 = 1-a^2, d2 = -2 a d1,
    d3 = -2 d1 (1 - 3 a^2)): Faa di Bruno orders 1..3.
    """
    if act_name != "tanh":
        raise ValueError("hand-rolled transport supports tanh only")

    def mean(v):
        return jnp.mean(v, axis=-1, keepdims=True)

    if gamma is not None:
        mu0 = mean(h0)
        c0 = h0 - mu0
        var0 = mean(c0 * c0)
        s0 = jnp.sqrt(var0 + _LN_EPS)
        inv_s0 = 1.0 / s0
        q0 = c0 * inv_s0
        y0 = q0 * gamma + beta
    else:
        y0 = h0

    a0 = jnp.tanh(y0)
    d1 = 1.0 - a0 * a0
    d2 = -2.0 * a0 * d1
    d3 = -2.0 * d1 * (1.0 - 3.0 * a0 * a0)

    groups_out: List[List[jax.Array]] = []
    for streams in groups:
        k = len(streams)
        if gamma is not None:
            c = [streams[i] - mean(streams[i]) for i in range(k)]
            # variance streams: var = mean(c^2)
            var1 = 2.0 * mean(c0 * c[0])
            s1 = 0.5 * var1 * inv_s0
            q1 = (c[0] - q0 * s1) * inv_s0
            y = [q1 * gamma]
            if k >= 2:
                var2 = 2.0 * mean(c[0] * c[0] + c0 * c[1])
                s2 = (0.5 * var2 - s1 * s1) * inv_s0
                q2 = (c[1] - 2.0 * q1 * s1 - q0 * s2) * inv_s0
                y.append(q2 * gamma)
            if k >= 3:
                var3 = 2.0 * mean(3.0 * c[0] * c[1] + c0 * c[2])
                s3 = (0.5 * var3 - 3.0 * s1 * s2) * inv_s0
                q3 = (c[2] - 3.0 * q2 * s1 - 3.0 * q1 * s2 - q0 * s3) * inv_s0
                y.append(q3 * gamma)
        else:
            y = streams

        out = [d1 * y[0]]
        if k >= 2:
            out.append(d1 * y[1] + d2 * y[0] * y[0])
        if k >= 3:
            out.append(
                d1 * y[2] + 3.0 * d2 * y[0] * y[1] + d3 * y[0] * y[0] * y[0]
            )
        groups_out.append(out)
    return a0, groups_out


def make_bundle_fn(
    model,
    dimension: int,
    spatial_order: int,
    temporal_order: int,
) -> Callable[[object, jax.Array], Tuple[jax.Array, Dict[int, List[jax.Array]]]]:
    """Build ``bundle_fn(params, z) -> (value, streams)`` for a PINNModel.

    ``z``: (N, dimension+1) PHYSICAL coordinates (x_1..x_d, t). Returns the
    batched primal (N,) and, per coordinate axis, the directional-derivative
    streams [d1, .., dk] (each (N,)) — spatial axes up to ``spatial_order``,
    the time axis up to ``temporal_order``. Exactly the quantities
    ``derivative_bundle`` produces point-wise.
    """
    from jax.experimental import jet

    cfg = model.config
    ap = cfg.arch_params
    act = get_activation(cfg.activation)
    use_ln = bool(cfg.layer_norm)
    n_hidden = len(cfg.hidden_dims)
    periodic = bool(ap.get("periodic", True))
    trainable_features = bool(ap.get("trainable_features", False))
    in_lo, in_scale = model._in_lo, model._in_scale
    frame_speed = model._frame_speed

    # Direction vectors in PHYSICAL space -> network-input space. The input
    # map w = ((A z) - lo) * in_scale - 1 is affine (A = optional co-moving
    # frame), so a physical direction v transports as (J_A v) * in_scale and
    # all its higher-order input streams vanish.
    in_dim = dimension + 1
    groups: List[Tuple[int, int]] = [(ax, spatial_order) for ax in range(dimension)]
    groups.append((dimension, temporal_order))
    groups = [(ax, k) for ax, k in groups if k > 0]

    def _net_direction(axis: int) -> jax.Array:
        # (1, in_dim) one-hot built from broadcasted_iota + where: `axis` is
        # static, and primitive-created constants (unlike captured numpy
        # arrays or scatters) lower inside the fused Pallas kernel
        # (ops/kernels/fused_step.py) as well as under plain XLA.
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, in_dim), 1)
        v = jnp.where(idx == axis, 1.0, 0.0)
        if frame_speed is not None and axis == dimension:
            # d/dt of (x - c t, t): every spatial column picks up -c.
            v = jnp.where(idx < dimension, -frame_speed, v)
        return v * in_scale

    is_fourier = cfg.architecture == "fourier"

    def bundle_fn(params, z: jax.Array):
        # ---- input affine map --------------------------------------- #
        x = z
        if frame_speed is not None:
            xs, t = x[..., :-1], x[..., -1:]
            x = jnp.concatenate([xs - frame_speed * t, t], axis=-1)
        w0 = (x - in_lo) * in_scale - 1.0

        if is_fourier:
            if trainable_features:
                B = _tree(params, "FourierFeatures_0", "B")
            else:
                B = _tree(model.constants, "constants", "FourierFeatures_0", "B")
            scale_2pi = 2.0 * jnp.pi if periodic else 1.0

            # ---- Fourier embedding (closed-form streams) ------------- #
            p0 = scale_2pi * (w0 @ B)  # (N, m)
            sin0, cos0 = jnp.sin(p0), jnp.cos(p0)
            # streams: aligned with `groups`; each entry [d1..dk] of (N, 2m)
            feat_streams: List[List[jax.Array]] = []
            for ax, k in groups:
                p1 = scale_2pi * (_net_direction(ax) @ B)  # (m,), const/batch
                s_cur, c_cur = sin0, cos0
                streams_g: List[jax.Array] = []
                for _ in range(k):
                    # d/ds sin(p(s)) = cos * p1 ; d/ds cos(p(s)) = -sin * p1
                    s_cur, c_cur = c_cur * p1, -s_cur * p1
                    streams_g.append(jnp.concatenate([s_cur, c_cur], axis=-1))
                feat_streams.append(streams_g)
            h0 = jnp.concatenate([sin0, cos0], axis=-1)
            h_streams = feat_streams
        else:
            # Plain MLP: the input map is affine, so first-order streams are
            # the constant (mapped) direction and higher orders are zero
            # until the first nonlinearity.
            h0 = w0
            h_streams = []
            for ax, k in groups:
                v = jnp.broadcast_to(_net_direction(ax), w0.shape)
                h_streams.append(
                    [v] + [jnp.zeros_like(w0) for _ in range(k - 1)]
                )

        # ---- hidden layers: stacked matmul + jet transport ----------- #
        def _dense(i: int, prim: jax.Array, streams: List[List[jax.Array]]):
            W = _tree(params, f"Dense_{i}", "kernel")
            b = _tree(params, f"Dense_{i}", "bias")
            flat = [prim] + [s for g in streams for s in g]
            n_each = prim.shape[0]
            out = jnp.concatenate(flat, axis=0) @ W
            parts = [out[j * n_each : (j + 1) * n_each] for j in range(len(flat))]
            new_prim = parts[0] + b
            new_streams, j = [], 1
            for g in streams:
                new_streams.append(parts[j : j + len(g)])
                j += len(g)
            return new_prim, new_streams

        max_order = max((len(g) for g in h_streams), default=0)
        handrolled = cfg.activation.lower() == "tanh" and max_order <= 3

        for i in range(n_hidden):
            h0, h_streams = _dense(i, h0, h_streams)

            if use_ln:
                gamma = _tree(params, f"LayerNorm_{i}", "scale")
                beta = _tree(params, f"LayerNorm_{i}", "bias")
            else:
                gamma = beta = None

            if handrolled:
                # Fused transport: LN statistics and tanh derivative factors
                # computed ONCE and shared across every direction group.
                h0, h_streams = _transport_block(
                    h0, h_streams, gamma, beta, "tanh"
                )
                continue

            if use_ln:

                def block(h, _g=gamma, _b=beta):
                    # flax LayerNorm (fast-variance form, eps inside sqrt).
                    mu = jnp.mean(h, axis=-1, keepdims=True)
                    var = jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu
                    y = (h - mu) / jnp.sqrt(var + _LN_EPS) * _g + _b
                    return act(y)

            else:

                def block(h):
                    return act(h)

            new_prim = None
            new_streams = []
            for streams_g in h_streams:
                k = len(streams_g)
                primal_out, coeffs = jet.jet(block, (h0,), ([*streams_g],))
                if new_prim is None:
                    new_prim = primal_out
                new_streams.append(list(coeffs[:k]))
            h0 = new_prim if new_prim is not None else block(h0)
            h_streams = new_streams

        # ---- output layer ------------------------------------------- #
        h0, h_streams = _dense(n_hidden, h0, h_streams)

        value = h0[:, 0]
        streams_by_axis: Dict[int, List[jax.Array]] = {}
        for (ax, _k), streams_g in zip(groups, h_streams):
            streams_by_axis[ax] = [s[:, 0] for s in streams_g]
        return value, streams_by_axis

    return bundle_fn
