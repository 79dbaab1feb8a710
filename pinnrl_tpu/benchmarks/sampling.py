"""Sampling-strategy benchmark harness (reference: pinnrl/benchmarks/sampling.py).

Compares collocation strategies (uniform / stratified / residual_based /
adaptive) on a fixed PDE with a fresh Fourier MLP per strategy (so the RL
agent cannot bleed state across strategies — reference: sampling.py:256-259),
a lightweight jitted train loop without trainer side effects
(reference: sampling.py:164-216), and a fixed validation grid for a fair L2
comparison (reference: sampling.py:141-161). Adds collocation-points/sec —
the BASELINE.json headline metric.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.rl import RLAgent

STRATEGIES = ("uniform", "stratified", "residual_based", "adaptive")
PDE_CHOICES = ("heat", "wave", "burgers", "kdv")


@dataclass
class SamplingResult:
    """One benchmark row (reference: sampling.py:42-64)."""

    pde: str
    architecture: str
    strategy: str
    final_loss: float
    l2_error: float
    rel_l2: float
    wall_time_s: float
    points_per_sec: float
    epochs: int
    seed: int


def _fixed_validation_grid(pde, n_side: int = 64):
    xs = jnp.linspace(pde.domain[0][0], pde.domain[0][1], n_side)
    ts = jnp.linspace(pde.time_domain[0], pde.time_domain[1], n_side)
    X, T = jnp.meshgrid(xs, ts, indexing="ij")
    return X.reshape(-1, 1), T.reshape(-1, 1)


def _evaluate(pde, model, params, x_grid, t_grid) -> Dict[str, float]:
    u = model.apply(params, jnp.concatenate([x_grid, t_grid], axis=-1))
    u = u.reshape(x_grid.shape[0], -1)[:, 0:1]
    exact = pde.exact_solution(x_grid, t_grid)
    if exact is None:
        return {"l2": float("nan"), "rel_l2": float("nan")}
    exact = exact.reshape(u.shape)
    err = u - exact
    l2 = float(jnp.sqrt(jnp.mean(err**2)))
    rel = float(jnp.sqrt(jnp.sum(err**2)) / (jnp.sqrt(jnp.sum(exact**2)) + 1e-12))
    return {"l2": l2, "rel_l2": rel}


def _build_benchmark_model(pde_key: str, seed: int, arch: str = "fourier"):
    """Fresh small net (64x3; Fourier gets mapping size 32) per strategy
    (reference: sampling.py:105-119).

    PDE posing follows the convergence recipes (e.g. Burgers gets the genuine
    traveling-wave exact solution with a steep moving front — the regime
    adaptive sampling exists for), so the rel-L2 comparison is meaningful.
    """
    from pinnrl_tpu.benchmarks.convergence import RECIPES

    cfg = load_config(pde_type=pde_key, architecture=arch)
    for k, v in (RECIPES.get(pde_key, {}).get("pde") or {}).items():
        if k == "parameters":
            cfg.pde.parameters.update(v)
        else:
            setattr(cfg.pde, k, v)
    cfg.model.hidden_dims = [64, 64, 64]
    if arch == "fourier":
        cfg.model.arch_params["mapping_size"] = 32
        cfg.model.arch_params["scale"] = 2.0
    return cfg, PINNModel(cfg, seed=seed)


# Steps fused per device call (lax.scan): per-step Python dispatch over the
# remote TPU tunnel costs ~25 ms, which would dominate the benchmark (the
# trainer and bench.py fuse for the same reason).
_INNER = 100


def _train_one(
    pde_key: str,
    strategy: str,
    epochs: int,
    batch: int,
    lr: float,
    seed: int,
    arch: str = "fourier",
    rar: Optional[Dict[str, float]] = None,
    rl_variant: str = "coord",
    windows: int = 0,
) -> SamplingResult:
    """``rl_variant`` (adaptive strategy only) — the round-4 probes for a
    regime where LEARNING should beat static residual bias (VERDICT r3
    next-step 4):

    - "coord":   shipped baseline — Q(x, t), reward = -weighted losses.
    - "resfeat": Q(x, t, log1p(|r|/mean|r|)) — the agent sees the SAME
      residual signal RAR uses *plus* coordinates, so tuned RAR is a
      special case of its hypothesis class; learning should dominate if
      residual magnitude is not uniformly informative across the domain.
    - "improve": reward = relative one-step decrease of the total loss
      (learning PROGRESS, not loss magnitude) — targets learnable points
      rather than merely high-residual ones.
    - "resfeat_improve": both.
    """
    cfg, model = _build_benchmark_model(pde_key, seed, arch=arch)
    cfg.training.collocation_distribution = strategy
    pde = create_pde(cfg)  # fresh PDE per strategy
    pde.attach_fast_bundle(model)  # stacked-jet residual path (trainer default)

    use_resfeat = "resfeat" in rl_variant
    use_improve = "improve" in rl_variant

    # Non-stationary regime (round 5, the VERDICT r4 untested hypothesis):
    # ``windows=W`` trains an expanding-horizon curriculum — phase w samples
    # collocation/BC/IC points from time_domain [t0, t0 + (w+1)/W * T] with
    # model, optimizer state, AND the RL agent carried across phases. Every
    # horizon extension exposes a fresh untrained region (a residual front
    # that jumps discontinuously): RAR re-scores its pool every step and
    # reacts immediately, while the DQN must relearn its Q-map — unless
    # learning the restart pattern pays, which is exactly the hypothesis.
    # Validation is always on the FULL horizon.
    def _phase_pde(w: int, phases: int):
        import copy

        t_lo, t_hi = pde.time_domain
        cfg_w = copy.deepcopy(cfg)
        cfg_w.pde.time_domain = [
            float(t_lo), float(t_lo + (w + 1) / phases * (t_hi - t_lo))
        ]
        pde_w = create_pde(cfg_w)
        pde_w.attach_fast_bundle(model)
        return pde_w

    agent = None
    rl_state = ()
    if strategy == "adaptive":
        agent = RLAgent(
            state_dim=cfg.model.input_dim + (1 if use_resfeat else 0),
            hidden_dim=64, memory_size=4096, batch_size=64,
        )
        rl_state = agent.init(jax.random.PRNGKey(seed + 1))

    def _res_feature(p, grid):
        """Scale-free residual feature: log1p(|r| / mean|r|) over the set."""
        r = pde.residual_score(
            model.apply, p, grid[:, :-1], grid[:, -1:]
        ).reshape(-1)
        r = jnp.abs(r)
        return jnp.log1p(r / (jnp.mean(r) + 1e-12))[:, None]

    # Cosine-annealed adam over the full horizon: a constant lr never gets
    # the steep-front problems out of their noise equilibrium (measured:
    # rel-L2 ~0.6 for EVERY strategy at 2500 constant-lr steps — an
    # artifact that demonstrates nothing).
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, epochs)),
    )
    params = model.params
    opt_state = opt.init(params)

    def build_step(pde):
        """Step function closure for one phase's PDE (windows>0 changes the
        sampling time_domain between phases; windows=0 has one phase)."""

        def sample(key, p, rl_st):
            if strategy == "residual_based":
                rfn = lambda xx, tt: pde.residual_score(model.apply, p, xx, tt)
                return pde.generate_collocation_points(
                    key, batch, strategy, residual_fn=rfn, **(rar or {})
                )
            if strategy == "adaptive":
                k1, k2 = jax.random.split(key)
                if use_resfeat:
                    sfn = lambda grid: agent.select_action(
                        rl_st, jnp.concatenate([grid, _res_feature(p, grid)], -1), k1
                    )
                else:
                    sfn = lambda grid: agent.select_action(rl_st, grid, k1)
                return pde.generate_collocation_points(k2, batch, strategy, score_fn=sfn)
            return pde.generate_collocation_points(key, batch, strategy)

        def step(carry, _):
            params, opt_state, rl_st, prev_loss, key = carry
            key, k_s, k_l, k_rl = jax.random.split(key, 4)
            x, t = sample(k_s, params, rl_st)

            def loss_fn(p):
                losses = pde.compute_loss(model.apply, p, x, t, key=k_l)
                return losses["total"], losses

            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if agent is not None:
                n = min(128, batch)
                res = pde.residual_score(model.apply, params, x[:n], t[:n])
                pts = jnp.concatenate([x[:n], t[:n]], axis=-1)
                if use_resfeat:
                    pts = jnp.concatenate([pts, _res_feature(params, pts)], -1)
                if use_improve:
                    # Learning-progress reward: relative one-step decrease
                    # of the total loss caused by training on this batch,
                    # shared across its points (bandit credit; Q regresses
                    # toward E[progress | point]). Clipped — single steps
                    # are noisy. First step (prev_loss sentinel 0) gets
                    # reward 0, not inf/inf = NaN, which would poison the
                    # replay buffer.
                    rel = jnp.clip(
                        (prev_loss - loss) / (prev_loss + 1e-9), -1.0, 1.0
                    )
                    reward = jnp.broadcast_to(
                        jnp.where(prev_loss > 0, rel, 0.0), (n,)
                    )
                else:
                    reward = agent.compute_reward(
                        res, losses["boundary"], losses["initial"]
                    )
                # Bandit transitions (done=1) + one epsilon step per step
                # (this harness runs one batch step per epoch).
                rl_st = agent.update(rl_st, pts, reward, pts, jnp.ones(()), k_rl)
                rl_st = agent.update_epsilon(rl_st)
            return (params, opt_state, rl_st, loss, key), loss

        return step

    phases = max(int(windows), 1)
    per_phase = [epochs // phases] * phases
    per_phase[-1] += epochs - sum(per_phase)

    key = jax.random.PRNGKey(seed)
    carry = (params, opt_state, rl_state, jnp.asarray(0.0), key)
    wall = 0.0
    losses_tail = None
    for w, n_ep in enumerate(per_phase):
        pde_w = pde if w == phases - 1 else _phase_pde(w, phases)
        step = build_step(pde_w)
        # Exactly `n_ep` steps run: full fused chunks plus one remainder
        # chunk (epochs=250 previously ran 200 steps yet reported 250-step
        # throughput).
        inner = min(n_ep, _INNER)
        n_full, rem = divmod(n_ep, inner)
        chunk = jax.jit(
            lambda c, _s=step, _n=inner: jax.lax.scan(_s, c, None, length=_n)
        )
        rem_chunk = jax.jit(
            lambda c, _s=step, _n=rem: jax.lax.scan(_s, c, None, length=_n)
        )
        # Warm-up compile outside the timed region.
        carry_w, _ = chunk(carry)
        if rem:
            carry_w, _ = rem_chunk(carry_w)
        jax.block_until_ready(carry_w[0])

        t0 = time.perf_counter()
        for _ in range(n_full):
            carry, losses_tail = chunk(carry)
        if rem:
            carry, losses_tail = rem_chunk(carry)
        jax.block_until_ready(carry[0])
        wall += time.perf_counter() - t0
    params, opt_state, rl_state, _, _ = carry
    loss = float(jax.block_until_ready(losses_tail)[-1])

    x_grid, t_grid = _fixed_validation_grid(pde)
    ev = _evaluate(pde, model, params, x_grid, t_grid)
    return SamplingResult(
        pde=pde_key,
        architecture=arch,
        strategy=(strategy if rl_variant == "coord" or strategy != "adaptive"
                  else f"adaptive[{rl_variant}]"),
        final_loss=loss,
        l2_error=ev["l2"],
        rel_l2=ev["rel_l2"],
        wall_time_s=wall,
        points_per_sec=epochs * batch / max(wall, 1e-9),
        epochs=epochs,
        seed=seed,
    )


def run_sampling_benchmark(
    pde: str = "heat",
    strategies: Optional[Sequence[str]] = None,
    epochs: int = 200,
    batch: int = 1024,
    lr: float = 2e-3,
    seed: int = 0,
    arch: str = "fourier",
    rar: Optional[Dict[str, float]] = None,
    windows: int = 0,
) -> List[SamplingResult]:
    """Benchmark every requested strategy (reference: sampling.py:219-289).

    ``rar`` optionally overrides the RAD hyper-parameters for the
    residual_based strategy (keys: pool_factor / uniform_floor / power).
    A strategy entry "adaptive[<variant>]" selects an RL variant
    (see ``_train_one``: resfeat / improve / resfeat_improve).
    ``windows=W`` trains the expanding-horizon non-stationary curriculum
    (see ``_train_one``).
    """
    if pde not in PDE_CHOICES:
        raise ValueError(f"pde must be one of {PDE_CHOICES}, got {pde!r}")
    strategies = list(strategies or STRATEGIES)
    parsed = []
    for s in strategies:
        variant = "coord"
        base = s
        if s.startswith("adaptive[") and s.endswith("]"):
            base, variant = "adaptive", s[len("adaptive["):-1]
        if base not in STRATEGIES:
            raise ValueError(f"Unknown strategy {s!r}; valid: {STRATEGIES}")
        if variant not in ("coord", "resfeat", "improve", "resfeat_improve"):
            raise ValueError(f"Unknown adaptive variant {variant!r}")
        parsed.append((base, variant))
    return [
        _train_one(pde, s, epochs, batch, lr, seed, arch=arch, rar=rar,
                   rl_variant=v, windows=windows)
        for s, v in parsed
    ]


def results_to_csv(results: List[SamplingResult]) -> str:
    header = (
        "pde,architecture,strategy,final_loss,l2_error,rel_l2,"
        "wall_time_s,points_per_sec,epochs,seed"
    )
    rows = [
        f"{r.pde},{r.architecture},{r.strategy},{r.final_loss:.6e},{r.l2_error:.6e},"
        f"{r.rel_l2:.6e},{r.wall_time_s:.3f},{r.points_per_sec:.1f},{r.epochs},{r.seed}"
        for r in results
    ]
    return "\n".join([header] + rows) + "\n"
