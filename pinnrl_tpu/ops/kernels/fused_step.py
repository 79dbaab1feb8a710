"""Fused forward+backward Pallas kernel for the residual loss.

The named remaining single-chip perf lever (docs/performance.md): under XLA
the stacked-jet forward writes every fusion-boundary activation (the
``(S*N, width)`` stacked streams, one per Dense layer) to HBM and the
backward reads them again — at bench widths the step is HBM-roofline-bound,
so that round trip IS the step time. This kernel computes

    loss_sum = sum_i r(z_i)^2       AND      d loss_sum / d params

in ONE ``pallas_call``: a sequential grid over batch tiles where each tile
runs the full stacked-jet forward (ops/jet_mlp.py, pure-jnp tanh/LN
transport), the PDE's residual arithmetic, and the reverse pass — all traced
by ``jax.vjp`` *inside the kernel body* (with a (1, 1) cotangent; a rank-0
loss has no reducible Mosaic layout), so every intermediate lives in
VMEM/registers and nothing but weights, coordinates, and the accumulated
gradients ever touches HBM.

Exposed through ``PDEBase.attach_fused_residual_kernel`` and gated exactly
like the other Pallas kernels (TPU backend only; XLA fallback elsewhere).
The custom-VJP wrapper computes gradients in the *forward* pallas call and
replays them in the backward, so ``jax.value_and_grad(total_loss)`` works
unchanged on top.

Reference parity note: accelerates the identical quantity the reference
computes with repeated ``torch.autograd.grad`` chains plus ``loss.backward``
(reference: pinnrl/pdes/pde_base.py:590-794, 1086-1135); a fused
single-program fwd+bwd has no torch counterpart — it is a TPU/VMEM-shaped
design.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.ops.jet_mlp import BundleView, make_bundle_fn

# Live-set budget for one tile's fused fwd+bwd program. VMEM is ~16 MB/core;
# leave headroom for weights, double buffering and Mosaic spills.
_VMEM_BUDGET_BYTES = 6 * 2**20
# Rough count of simultaneously-live stacked activations under AD (forward
# residuals + cotangents), measured from interpret-mode peak on the bench
# config. Conservative by design: a too-small tile only costs grid steps.
_LIVE_TENSORS = 24


def _numpy_shim(model):
    """Model stand-in whose captured constants are host numpy arrays.

    ``make_bundle_fn`` closes over ``model.constants`` / ``_in_lo`` /
    ``_in_scale``; if those are device arrays they would be embedded as MLIR
    constants inside the kernel — the exact pattern the axon backend cannot
    lower (see memory: tpu-backend-quirks). Numpy constants embed fine.
    """
    consts = jax.tree_util.tree_map(np.asarray, model.constants)
    return SimpleNamespace(
        config=model.config,
        constants=consts,
        _in_lo=np.asarray(model._in_lo),
        _in_scale=np.asarray(model._in_scale),
        _frame_speed=model._frame_speed,
        output_transform=model.output_transform,
    )


# Largest tile measured to FIT scoped VMEM on hardware, keyed by
# (stacked_streams, width) — benchmark_results/fused_kernel_ab.json:
#   (4, 512) burgers-class 256-wide: tile 64 runs, 128 OOMs (round 4);
#   (5, 512) kdv-class order-3:      tile 32 runs (1.08x vs XLA with
#            causal), 64 OOMs (round 5).
# The analytic _LIVE_TENSORS formula is deliberately conservative and
# underestimates these (it picked 16 for kdv — a measured 0.89x LOSS);
# measured entries override it.
_MEASURED_TILES = {(4, 512): 64, (5, 512): 32}


def pick_tile(
    n_points: int, stacked_streams: int, width: int, causal: bool = False
) -> int:
    """Largest power-of-two tile whose fused live set fits the VMEM budget.

    ``causal`` adds the (tile, tile) strict-lower-triangular prefix matrix
    the causal variant materializes in VMEM (see ``make_fused_residual_loss``).
    """
    tile = _MEASURED_TILES.get((stacked_streams, width))
    if tile is None:
        per_row = stacked_streams * width * 4 * _LIVE_TENSORS
        tile = 1 << max(
            int(np.floor(np.log2(max(_VMEM_BUDGET_BYTES // max(per_row, 1), 8)))), 3
        )
        if causal:
            while tile > 8 and tile * per_row + 4 * tile * tile > _VMEM_BUDGET_BYTES:
                tile //= 2
    while n_points % tile:
        tile //= 2
    return max(tile, 8)


def make_fused_residual_loss(
    model,
    pde,
    *,
    tile: Optional[int] = None,
    interpret: bool = False,
    causal_eps: float = 0.0,
) -> Callable:
    """Build ``fn(net_params, z) -> residual loss`` with a fused VJP.

    ``net_params`` is the model's flax param tree; ``z`` is ``(N, dim+1)``.
    The returned callable is differentiable w.r.t. ``net_params`` (custom
    VJP backed by the same pallas call); the cotangent w.r.t. ``z`` is zero
    (collocation coordinates are data, never trained through this path).

    With ``causal_eps > 0`` the kernel computes the EXACT causally-weighted
    loss of ``PDEBase._residual_loss`` — ``sum_i w_i r_i^2 / sum_i w_i``
    with ``w_i = exp(-eps * sum_{j<i} r_j^2 / N)`` over time-sorted points —
    fused into the same single pass. The caller must pass ``z`` sorted by
    ascending time (``compute_loss`` does the argsort in XLA). This exploits
    a TPU-specific property: Pallas grid steps execute SEQUENTIALLY on a
    core, so a running prefix of ``sum r^2`` carried across batch tiles (an
    accumulated (1,1) output read back each step) reproduces the global
    exclusive cumsum without a second pass — the two-sweep structure a
    data-parallel GPU grid would force simply never materializes. The
    weights are stop-gradiented exactly as in the XLA path, so the VJP of
    the numerator alone (scaled by the accumulated ``1/sum w``) is the true
    gradient.
    """
    from jax.experimental import pallas as pl

    spatial_order = max(pde.spatial_orders, default=0)
    temporal_order = max(pde.temporal_orders, default=0)
    shim = _numpy_shim(model)
    # Pallas refuses captured non-scalar constants: the model's pinned
    # Fourier basis and the input-affine lo/scale are threaded through the
    # kernel as operands and re-injected into the shim at trace time.
    const_tree = {
        "c": shim.constants,
        "lo": shim._in_lo.astype(np.float32),
        "scale": shim._in_scale.astype(np.float32),
    }
    const_treedef = jax.tree_util.tree_structure(const_tree)
    const_shapes = [np.asarray(l).shape for l in jax.tree_util.tree_leaves(const_tree)]
    n_streams = 1 + pde.dimension * spatial_order + temporal_order
    width = max([model.config.hidden_dims[0]]
                + [2 * int(model.config.arch_params.get("mapping_size", 0))])

    treedef = jax.tree_util.tree_structure(model.params)
    leaf_shapes = [l.shape for l in jax.tree_util.tree_leaves(model.params)]

    def _leaf2d(a):
        return a.reshape(1, -1) if a.ndim == 1 else a

    eps = float(causal_eps or 0.0)
    causal = eps > 0.0

    def _tile_residuals(leaves2d, const_leaves2d, z_tile):
        leaves = [
            l.reshape(s) if l.shape != s else l
            for l, s in zip(leaves2d, leaf_shapes)
        ]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        cl = [
            l.reshape(s) if l.shape != s else l
            for l, s in zip(const_leaves2d, const_shapes)
        ]
        consts = jax.tree_util.tree_unflatten(const_treedef, cl)
        shim.constants = consts["c"]
        shim._in_lo, shim._in_scale = consts["lo"], consts["scale"]
        bundle_fn = make_bundle_fn(
            shim, pde.dimension, spatial_order=spatial_order,
            temporal_order=temporal_order,
        )
        value, streams = bundle_fn(params, z_tile)

        def point_res(val, st, zz):
            return pde.residual_pointwise(BundleView(val, st), zz, None)

        r = jax.vmap(point_res)(value, streams, z_tile)
        # Row vector of squared residuals: reductions below are (1, N) @
        # (N, 1) matmuls — Mosaic cannot lower the 1D multi_reduction
        # layout a plain jnp.sum(r * r) produces ("Not implemented: Offset
        # change"); the rank-2 dot lowers cleanly and so does its transpose.
        return (r * r).reshape(1, -1)

    def _tile_loss(leaves2d, const_leaves2d, z_tile, carry11, inv_n):
        """(weighted) sum of squared residuals for one tile.

        Returns ``(num, (sum_r2, sum_w))`` — aux carries the prefix update
        and the weight mass; both are stop-grad by construction (the vjp
        only flows through ``num``'s explicit r^2 factor)."""
        rr = _tile_residuals(leaves2d, const_leaves2d, z_tile)
        t = rr.shape[1]
        ones = jnp.ones((t, 1), rr.dtype)
        if not causal:
            num = rr @ ones
            return num, (num, jnp.full((1, 1), float(t), rr.dtype))
        # Exclusive in-tile prefix via a strict-lower-triangular matmul:
        # M[j, i] = 1 iff j < i, so (rr @ M)[i] = sum_{j<i} rr[j]. iota
        # comparison materializes M in VMEM ((t, t) f32, budgeted in
        # pick_tile); cumsum lowers poorly under Mosaic, the matmul is MXU.
        row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        m = (row < col).astype(rr.dtype)
        cum_prev = carry11 + rr @ m
        w = jax.lax.stop_gradient(jnp.exp(-eps * inv_n * cum_prev))
        num = (w * rr) @ ones
        return num, (rr @ ones, w @ ones)

    def _run(leaves2d, const_leaves2d, z):
        n = z.shape[0]
        t = tile or pick_tile(n, n_streams, width, causal=causal)
        if n % t:
            raise ValueError(f"batch {n} not divisible by tile {t}")
        grid = n // t
        inv_n = 1.0 / n
        n_leaves = len(leaves2d)
        n_consts = len(const_leaves2d)

        def kernel(*refs):
            z_ref = refs[0]
            leaf_refs = refs[1 : 1 + n_leaves]
            const_refs = refs[1 + n_leaves : 1 + n_leaves + n_consts]
            loss_ref = refs[1 + n_leaves + n_consts]
            sumw_ref = refs[2 + n_leaves + n_consts]
            cum_ref = refs[3 + n_leaves + n_consts]
            grad_refs = refs[4 + n_leaves + n_consts :]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                loss_ref[...] = jnp.zeros_like(loss_ref)
                sumw_ref[...] = jnp.zeros_like(sumw_ref)
                cum_ref[...] = jnp.zeros_like(cum_ref)
                for gr in grad_refs:
                    gr[...] = jnp.zeros_like(gr)

            leaves = [r[...] for r in leaf_refs]
            cleaves = [r[...] for r in const_refs]
            # Sequential-grid prefix carry: cum_ref holds sum r^2 of all
            # PREVIOUS tiles (time-sorted input), read before this tile's
            # update — the global exclusive cumsum, one pass.
            carry11 = cum_ref[...]
            # jax.vjp with a (1, 1) cotangent: value_and_grad would force a
            # rank-0 loss, whose Mosaic layout cannot be reduced into.
            l11, vjp, aux = jax.vjp(
                lambda lv: _tile_loss(lv, cleaves, z_ref[...], carry11, inv_n),
                leaves,
                has_aux=True,
            )
            (g,) = vjp(jnp.ones((1, 1), jnp.float32))
            sum_r2, sum_w = aux

            loss_ref[...] += l11
            sumw_ref[...] += sum_w
            cum_ref[...] += sum_r2
            for gr, gg in zip(grad_refs, g):
                gr[...] += gg

        out_shape = [
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # weighted sum
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # sum of weights
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # prefix carry
        ] + [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves2d]
        in_specs = [pl.BlockSpec((t, z.shape[1]), lambda i: (i, 0))] + [
            pl.BlockSpec(l.shape, lambda i: (0, 0))
            for l in [*leaves2d, *const_leaves2d]
        ]
        out_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ] + [pl.BlockSpec(l.shape, lambda i: (0, 0)) for l in leaves2d]
        loss, sumw, _cum, *grads = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(z, *leaves2d, *const_leaves2d)
        return loss[0, 0], sumw[0, 0], grads

    const_leaves2d_static = [
        _leaf2d(jnp.asarray(np.asarray(l, dtype=np.float32)))
        for l in jax.tree_util.tree_leaves(const_tree)
    ]

    @jax.custom_vjp
    def fused_loss(net_params, z):
        leaves2d = [_leaf2d(l) for l in jax.tree_util.tree_leaves(net_params)]
        loss, sumw, _ = _run(leaves2d, const_leaves2d_static, z)
        return loss / sumw

    def fused_fwd(net_params, z):
        leaves2d = [_leaf2d(l) for l in jax.tree_util.tree_leaves(net_params)]
        loss, sumw, grads2d = _run(leaves2d, const_leaves2d_static, z)
        grads = [
            g.reshape(s) if g.shape != s else g
            for g, s in zip(grads2d, leaf_shapes)
        ]
        # Normalization 1/sum(w) is stop-grad (weights are stop-gradiented
        # in the XLA reference semantics too), so scaling the accumulated
        # numerator gradient is the exact loss gradient.
        inv_w = 1.0 / sumw
        grad_tree = jax.tree_util.tree_unflatten(
            treedef, [g * inv_w for g in grads]
        )
        return loss * inv_w, (grad_tree, jnp.zeros_like(z))

    def fused_bwd(res, g):
        grad_tree, z_zero = res
        return jax.tree_util.tree_map(lambda x: x * g, grad_tree), z_zero

    fused_loss.defvjp(fused_fwd, fused_bwd)
    return fused_loss


def supports(model, pde, training=None) -> bool:
    """Gate: same structural conditions as the stacked-jet bundle, plus the
    reductions the kernel hard-codes (plain MSE, no trainable PDE
    coefficients) and a TPU backend (XLA fallback otherwise — the fused
    program targets Mosaic/VMEM).

    Width gate (measured, docs/performance.md round 4): the kernel wins
    only where the XLA step is genuinely HBM-bound — 1.28x at 256-wide
    trunks (3.28 -> 2.55 ms/step, batch 8192) but 0.73x at 64-wide, where
    the VMEM cap forces small batch tiles whose 64-lane matmuls underfill
    the MXU while XLA's fusion already keeps the working set on-chip. Auto
    mode therefore requires every matmul in the trunk to be >= 128 wide.

    Round 5 lifted two round-4 exclusions after on-hardware measurement
    (benchmark_results/fused_kernel_ab.json, kdv rows): causal weighting
    (exact prefix semantics via the sequential-grid carry, see
    ``make_fused_residual_loss``) and order-3 spatial jets (KdV-class; the
    5-stream live set fits the same VMEM budget at a smaller tile)."""
    from pinnrl_tpu.ops import jet_mlp

    if not (pde.bundle_compatible and pde.system_size == 1
            and jet_mlp.supports(model)):
        return False
    if getattr(pde, "trainable_parameters", None):
        return False
    if training is not None:
        if getattr(training, "loss_function", "mse") != "mse":
            return False
    widths = list(model.config.hidden_dims)
    m = int(model.config.arch_params.get("mapping_size", 0))
    if m:
        widths.append(2 * m)
    if min(widths) < 128:
        return False
    # Measured scope: order-4 jets (CH biharmonic) remain unmeasured on
    # hardware — auto mode stays within measurement; use
    # attach_fused_residual_kernel(model, enable="on") to opt in.
    if max(pde.spatial_orders, default=0) > 3:
        return False
    if max(pde.temporal_orders, default=0) > 1:
        return False
    return True
