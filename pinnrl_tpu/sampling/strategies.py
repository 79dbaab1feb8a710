"""Collocation sampling strategies as pure, jittable functions of a PRNG key.

TPU-native rework of the reference samplers (reference: pinnrl/pdes/
pde_base.py:806-1084): fixed output shapes, no host round-trips —
residual-adaptive refinement (RAR) and the RL-scored grid both stay on
device via ``jax.random.categorical``.

Every sampler returns ``(x, t)`` with ``x: (n, dim)`` and ``t: (n, 1)``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Domain = Sequence[Tuple[float, float]]


def _bounds(domain: Domain, time_domain: Tuple[float, float]):
    lo = jnp.array([d[0] for d in domain] + [time_domain[0]], jnp.float32)
    hi = jnp.array([d[1] for d in domain] + [time_domain[1]], jnp.float32)
    return lo, hi


def sample_uniform(
    key: jax.Array, n: int, domain: Domain, time_domain: Tuple[float, float]
) -> Tuple[jax.Array, jax.Array]:
    """IID uniform points over space x time (reference: pde_base.py:806-860;
    the reference jitters a lattice — IID uniform is the unbiased TPU-native
    equivalent with identical coverage in expectation)."""
    lo, hi = _bounds(domain, time_domain)
    z = jax.random.uniform(key, (n, lo.shape[0]), minval=lo, maxval=hi)
    return z[:, :-1], z[:, -1:]


def sample_stratified(
    key: jax.Array, n: int, domain: Domain, time_domain: Tuple[float, float]
) -> Tuple[jax.Array, jax.Array]:
    """Latin-hypercube sampling: one point per equal-width bin per dimension,
    bins independently shuffled per dim (reference: pde_base.py:862-893)."""
    lo, hi = _bounds(domain, time_domain)
    d = lo.shape[0]
    keys = jax.random.split(key, 2 * d)
    cols = []
    for i in range(d):
        jitter = jax.random.uniform(keys[2 * i], (n,))
        centers = (jnp.arange(n) + jitter) / n
        perm = jax.random.permutation(keys[2 * i + 1], n)
        cols.append(lo[i] + (hi[i] - lo[i]) * centers[perm])
    z = jnp.stack(cols, axis=-1)
    return z[:, :-1], z[:, -1:]


def sample_residual_based(
    key: jax.Array,
    n: int,
    domain: Domain,
    time_domain: Tuple[float, float],
    residual_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    pool_factor: int = 4,
    eps: float = 1e-8,
    uniform_floor: float = 4.0,
    power: float = 1.0,
    replace: bool = False,
    chunk_size: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Residual-Adaptive Refinement: draw a ``pool_factor * n`` uniform pool,
    evaluate |residual|, resample n points with probability
    ``p ~ |r|^k / mean|r|^k + c`` (reference: pde_base.py:895-935). Falls
    back to uniform when no residual function is supplied.

    ``k`` (``power``) and the additive floor ``c`` (``uniform_floor``) are
    the RAD hyper-parameters of Wu et al. 2023, CMAME "A comprehensive
    study of non-adaptive and residual-based adaptive sampling for PINNs"
    (their nominal k=1 c=1). The shipped defaults come from a 14-config x
    6-seed sweep on the Burgers-front harness
    (benchmark_results/rar_sweep*.csv, summarized in
    benchmark_results/README.md):

    - ``replace=False`` — weighted sampling WITHOUT replacement (Gumbel
      top-k): with replacement, n draws from a 4n pool waste ~25% of a
      peaked batch on duplicates, which alone made RAR lose to uniform.
    - ``uniform_floor=4.0`` — a strong floor. Moderate bias is what pays:
      c=4 ties uniform on the easy front (nu=0.01) and beats it 1.3x on
      the sharp front (nu=0.004); every stronger-bias config (c<=1, k=2,
      or with-replacement) is worse in BOTH regimes, and c=0 loses 3x.

    Pools larger than ``chunk_size`` are evaluated sequentially via
    ``lax.map`` (the pool is rounded up to a whole number of chunks):
    order-3 residual jets over a 4x pool of >=32k points otherwise
    materialize all tangent buffers at once and exhaust HBM.
    """
    if residual_fn is None:
        return sample_uniform(key, n, domain, time_domain)
    k_pool, k_pick = jax.random.split(key)
    pool = pool_factor * n
    if pool > chunk_size:
        pool = -(-pool // chunk_size) * chunk_size
    x_pool, t_pool = sample_uniform(k_pool, pool, domain, time_domain)
    if pool > chunk_size:
        xs = x_pool.reshape(-1, chunk_size, x_pool.shape[-1])
        ts = t_pool.reshape(-1, chunk_size, 1)
        r = jax.lax.map(
            lambda p: jnp.abs(residual_fn(p[0], p[1])).reshape(-1), (xs, ts)
        ).reshape(-1)
    else:
        r = jnp.abs(residual_fn(x_pool, t_pool)).reshape(-1)
    if power != 1.0:
        r = r**power
    p = r / (jnp.mean(r) + eps) + uniform_floor
    # All-zero weights (possible with uniform_floor=0 and a zero residual
    # field, e.g. a zero-init net at step 0) would make every logit -inf and
    # categorical degenerate to repeatedly picking index 0 — fall back to a
    # uniform draw over the pool instead (reference's `r + eps` guard,
    # pde_base.py:895-935).
    p = jnp.where(jnp.sum(p) > 0, p, jnp.ones_like(p))
    if replace:
        idx = jax.random.categorical(k_pick, jnp.log(p), shape=(n,))
    else:
        # Weighted sampling WITHOUT replacement via the Gumbel top-k trick
        # (Vieira 2014): top-n of log p + Gumbel noise is an exact sample
        # from the successive-draws-without-replacement process, fully
        # on-device. With replacement, drawing n from a 4n pool wastes
        # ~11% of the batch on duplicates.
        g = -jnp.log(-jnp.log(jax.random.uniform(k_pick, p.shape) + 1e-12) + 1e-12)
        _, idx = jax.lax.top_k(jnp.log(p) + g, n)
    return x_pool[idx], t_pool[idx]


def make_grid(
    domain: Domain, time_domain: Tuple[float, float], points_per_axis: int = 100
) -> jax.Array:
    """Regular evaluation grid over (space, time), flattened to (G, dim+1).

    Capped at 100 points per axis like the reference's adaptive sampler grid
    (reference: pde_base.py:961-1076).
    """
    axes = [jnp.linspace(lo, hi, points_per_axis) for lo, hi in domain]
    axes.append(jnp.linspace(time_domain[0], time_domain[1], points_per_axis))
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([m.reshape(-1) for m in mesh], axis=-1)


def sample_adaptive(
    key: jax.Array,
    n: int,
    domain: Domain,
    time_domain: Tuple[float, float],
    score_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    points_per_axis: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """RL-agent-scored sampling: the DQN policy scores a regular grid;
    |scores| are normalized into a categorical distribution, n cells are
    drawn, and points are jittered within cells and clamped to the domain
    (reference: pde_base.py:961-1076). Falls back to uniform with no agent.
    """
    if score_fn is None:
        return sample_uniform(key, n, domain, time_domain)
    grid = make_grid(domain, time_domain, points_per_axis)
    scores = jnp.abs(score_fn(grid)).reshape(-1)
    # Same uniform floor as RAR (see sample_residual_based): the policy
    # concentrates, the floor keeps base coverage.
    p = scores / (jnp.mean(scores) + 1e-8) + 1.0
    k_pick, k_jit = jax.random.split(key)
    if n <= p.shape[0]:
        # Gumbel top-k: weighted WITHOUT replacement (same duplicate-waste
        # argument as RAR; the in-cell jitter below decorrelates positions
        # but duplicate cells still concentrate mass the policy didn't ask
        # for). Falls back to categorical when n exceeds the grid.
        g = -jnp.log(-jnp.log(jax.random.uniform(k_pick, p.shape) + 1e-12) + 1e-12)
        _, idx = jax.lax.top_k(jnp.log(p) + g, n)
    else:
        idx = jax.random.categorical(k_pick, jnp.log(p), shape=(n,))
    picked = grid[idx]
    lo, hi = _bounds(domain, time_domain)
    cell = (hi - lo) / (points_per_axis - 1)
    jitter = jax.random.uniform(
        k_jit, picked.shape, minval=-0.5, maxval=0.5
    ) * cell
    z = jnp.clip(picked + jitter, lo, hi)
    return z[:, :-1], z[:, -1:]
