"""Forward-mode derivative engine for PINN residuals.

This replaces the reference's repeated ``torch.autograd.grad(create_graph=True)``
chains (reference: pinnrl/pdes/pde_base.py:590-794) with an idiomatic-TPU design:

- The network is evaluated as a *point-wise scalar function* ``u(z)`` of the
  stacked coordinate vector ``z = (x_1..x_d, t)``.
- Directional derivatives along coordinate axes come from **Taylor-mode AD**
  (``jax.experimental.jet``) — one pass yields all orders up to ``k`` at
  O(k) cost — with a nested-``jax.jvp`` fallback for primitives jet does not
  cover.
- The per-point derivative bundle is ``vmap``-ed over the collocation batch,
  so the whole residual evaluation compiles to a handful of batched MXU
  matmuls inside one XLA program. No data-dependent control flow, no
  per-order graph retention.

Key naming matches the reference so PDE code reads identically:
``u, dt, dt2, dx, dx2, dx3, dx4`` (1D) / ``dx1, dx1x1, ...`` (N-D), plus
``laplacian``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Iterable, Sequence

import jax
import jax.numpy as jnp

Scalar = jax.Array
PointFn = Callable[[jax.Array], jax.Array]  # (d+1,) -> () scalar


def make_scalar_fn(apply_fn: Callable, params, out_index: int = 0) -> PointFn:
    """Wrap a model apply into a point-wise scalar function u(z).

    ``apply_fn(params, z)`` is expected to map a ``(in_dim,)`` coordinate
    vector to an ``(out_dim,)`` output; physics residuals differentiate the
    ``out_index`` channel (the reference's models emit ``(N, 1)``,
    reference: pinnrl/neural_networks/__init__.py:144).
    """

    def u(z: jax.Array) -> jax.Array:
        out = apply_fn(params, z)
        return jnp.reshape(out, (-1,))[out_index]

    return u


def _nested_jvp(u: PointFn, z: jax.Array, v: jax.Array, order: int) -> list:
    """Orders 1..order of the directional derivative via nested jax.jvp."""

    derivs = []
    fn = u
    for _ in range(order):
        prev = fn

        def fn(zz, _prev=prev):  # noqa: E731 — loop-local closure over _prev
            return jax.jvp(_prev, (zz,), (v,))[1]

        derivs.append(fn(z))
    return derivs


def _jet_series(u: PointFn, z: jax.Array, v: jax.Array, order: int) -> list:
    """Orders 1..order via one Taylor-mode (jet) pass: O(order) cost."""
    from jax.experimental import jet

    series = [v] + [jnp.zeros_like(v) for _ in range(order - 1)]
    _, coeffs = jet.jet(u, (z,), (series,))
    # jet returns d^k/dt^k u(z + t v) at t=0 directly (factorial-scaled
    # Taylor coefficients), i.e. the k-th directional derivatives.
    return [coeffs[k] for k in range(order)]


def _supports_jet(u: PointFn, z_shape: tuple, dtype) -> bool:
    """Probe (via abstract tracing) whether jet has rules for every primitive in u."""
    try:
        z = jnp.zeros(z_shape, dtype)
        v = jnp.zeros(z_shape, dtype)
        jax.eval_shape(lambda zz: _jet_series(u, zz, v, 2)[0], z)
        return True
    except Exception:
        return False


def directional_derivative(
    u: PointFn, z: jax.Array, axis: int, order: int, mode: str = "jvp"
) -> list:
    """Derivatives of orders 1..order of u along coordinate ``axis`` at point z.

    ``u`` may be a :class:`~pinnrl_tpu.ops.jet_mlp.BundleView` — a stand-in
    backed by precomputed stacked-jet streams — in which case the streams
    are returned directly (the fast residual path; see ops/jet_mlp.py).
    """
    from pinnrl_tpu.ops.jet_mlp import BundleView

    if isinstance(u, BundleView):
        return u.directional(axis, order)
    v = jnp.zeros_like(z).at[axis].set(1.0)
    if mode == "jet":
        return _jet_series(u, z, v, order)
    return _nested_jvp(u, z, v, order)


def laplacian(u: PointFn, z: jax.Array, spatial_axes: Sequence[int], mode: str = "jvp") -> Scalar:
    """Sum of pure second directional derivatives over the spatial axes."""
    total = jnp.zeros(())
    for ax in spatial_axes:
        total = total + directional_derivative(u, z, ax, 2, mode=mode)[1]
    return total


def derivative_bundle(
    u: PointFn,
    z: jax.Array,
    dimension: int,
    spatial_orders: Iterable[int] = (1, 2),
    temporal_orders: Iterable[int] = (1,),
    mode: str = "auto",
) -> Dict[str, Scalar]:
    """Point-wise derivative dictionary with reference-compatible keys.

    ``z`` is the stacked coordinate vector ``(x_1..x_dimension, t)``. Returns
    ``u``, ``dt``/``dt2``, per-axis spatial derivatives (``dx``/``dx2``/...
    in 1D; ``dx1``, ``dx1x1``, ... in N-D — reference: pde_base.py:590-794),
    and ``laplacian`` whenever spatial order >= 2 was requested.

    Designed to be wrapped in ``jax.vmap`` over a batch of points.
    """
    spatial_orders = sorted(set(int(o) for o in spatial_orders))
    temporal_orders = sorted(set(int(o) for o in temporal_orders))
    max_s = spatial_orders[-1] if spatial_orders else 0
    max_t = temporal_orders[-1] if temporal_orders else 0

    if mode == "auto":
        # jet is O(order) per pass but lacks rules for some primitives;
        # probe once at trace-build time (static, so jit sees a fixed graph).
        mode = "jet" if max(max_s, max_t) >= 3 and _supports_jet(u, z.shape, z.dtype) else "jvp"

    out: Dict[str, Scalar] = {"u": u(z)}
    t_axis = dimension

    if max_t:
        dts = directional_derivative(u, z, t_axis, max_t, mode=mode)
        for o in temporal_orders:
            out["dt" if o == 1 else f"dt{o}"] = dts[o - 1]

    if max_s:
        lap = jnp.zeros(())
        for ax in range(dimension):
            dxs = directional_derivative(u, z, ax, max_s, mode=mode)
            if max_s >= 2:
                lap = lap + dxs[1]
            for o in spatial_orders:
                if dimension == 1:
                    key = "dx" if o == 1 else f"dx{o}"
                else:
                    key = "d" + f"x{ax + 1}" * o
                out[key] = dxs[o - 1]
        if max_s >= 2:
            out["laplacian"] = lap
    return out


def batched_derivative_bundle(
    apply_fn: Callable,
    params,
    x: jax.Array,
    t: jax.Array,
    dimension: int,
    spatial_orders: Iterable[int] = (1, 2),
    temporal_orders: Iterable[int] = (1,),
    mode: str = "auto",
) -> Dict[str, jax.Array]:
    """Batch API matching the reference's ``compute_derivatives(model, x, t, ...)``.

    ``x``: (N, d), ``t``: (N, 1). Returns (N, 1)-shaped arrays per key.
    """
    z = jnp.concatenate([x, t], axis=-1)
    u = make_scalar_fn(apply_fn, params)
    fn = partial(
        derivative_bundle,
        u,
        dimension=dimension,
        spatial_orders=tuple(spatial_orders),
        temporal_orders=tuple(temporal_orders),
        mode=mode,
    )
    bundle = jax.vmap(fn)(z)
    return {k: v.reshape(-1, 1) for k, v in bundle.items()}


def hvp_diag(u: PointFn, z: jax.Array, axes: Sequence[int]) -> jax.Array:
    """Diagonal Hessian entries along given axes (forward-over-forward)."""
    return jnp.stack([directional_derivative(u, z, ax, 2)[1] for ax in axes])


def factorial(n: int) -> int:
    return math.factorial(n)
