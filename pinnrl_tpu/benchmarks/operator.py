"""Well-pipeline FNO operator benchmark (BASELINE.json headline config #5:
"... + The Well dataset FNO operator run").

Trains the FNO architecture in the registry-recommended data mode on a Well
dataset slice served through ``load_well_slice`` and reports held-out
rel-L2 on a disjoint split. With ``the_well`` installed any registry entry
works; offline, the ``synthetic_heat_2d`` entry (exact heat-kernel
trajectories injected into the loader cache, see datasets/synthetic.py)
exercises the identical pipeline — registry defaults overlay
(training/train.py:140-158), loader cache, data-mode loss gating.

Run:  python -m pinnrl_tpu.benchmarks.cli operator --dataset synthetic_heat_2d
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.config import load_config
from pinnrl_tpu.datasets import get_entry, load_well_slice
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer


@dataclass
class OperatorResult:
    dataset: str
    architecture: str
    mode: str
    epochs: int
    train_points: int
    test_rel_l2: float
    test_max_error: float
    final_train_loss: float
    wall_time_s: float
    seed: int


def run_operator_benchmark(
    dataset: str = "synthetic_heat_2d",
    arch: Optional[str] = None,
    epochs: int = 2000,
    n_traj: int = 1,
    n_points: int = 8192,
    seed: int = 0,
    base: Optional[str] = None,
) -> OperatorResult:
    """Held-out rel-L2 is measured on test-split points DISJOINT from the
    train points but on the same field (see datasets/synthetic.py): the
    point-wise model has no input-function conditioning, so scattered-sample
    field reconstruction is the task it can perform. ``n_traj`` defaults to 1
    because multi-trajectory point clouds overlay conflicting targets at
    equal coordinates for a point-wise fit."""
    entry = get_entry(dataset)
    if dataset.startswith("synthetic"):
        from pinnrl_tpu.datasets.synthetic import ensure_synthetic_well_cache

        for split in ("train", "test"):
            ensure_synthetic_well_cache(
                dataset, split=split, n_traj=n_traj, n_points=n_points,
                seed=seed, base=base,
            )

    arch = arch or entry.default_architecture
    cfg = load_config(
        pde_type=entry.default_pde_key or "heat", architecture=arch
    )
    # Registry defaults overlay — same contract as `pinnrl-train --dataset`
    # (training/train.py:140-158).
    cfg.pde.observation_data = {
        "source": "well", "name": entry.name, "split": "train",
        "n_traj": n_traj, "n_points": n_points, "seed": seed, "base": base,
    }
    cfg.pde.dimension = entry.n_spatial_dims
    cfg.pde.domain = [list(d) for d in entry.domain]
    cfg.pde.time_domain = list(entry.time_domain)
    cfg.model.input_dim = entry.default_input_dim
    cfg.model.output_dim = entry.default_output_dim
    cfg.training.mode = entry.recommended_mode
    cfg.training.num_epochs = epochs
    cfg.training.num_collocation_points = max(n_points, 1024)
    cfg.training.batch_size = min(4096, n_points)
    cfg.training.early_stopping.enabled = False
    cfg.training.validation_frequency = max(epochs // 4, 1)

    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    res = trainer.train(seed=seed)
    wall = time.perf_counter() - t0

    test = load_well_slice(
        entry.name, split="test", n_traj=n_traj, n_points=n_points,
        seed=seed, base=base,
    )
    params = trainer._final_state["params"]["net"]
    z = jnp.concatenate(
        [jnp.asarray(test["x"]), jnp.asarray(test["t"])], axis=-1
    )
    pred = np.asarray(model.apply(params, z)).reshape(test["u"].shape[0], -1)
    u = np.asarray(test["u"]).reshape(pred.shape)
    diff = pred - u
    rel_l2 = float(np.linalg.norm(diff) / (np.linalg.norm(u) + 1e-12))
    return OperatorResult(
        dataset=entry.name,
        architecture=arch,
        mode=cfg.training.mode,
        epochs=epochs,
        train_points=n_points,
        test_rel_l2=rel_l2,
        test_max_error=float(np.abs(diff).max()),
        final_train_loss=float(res["final_train_loss"]),
        wall_time_s=wall,
        seed=seed,
    )


def run_gridded_operator_benchmark(
    dataset: str = "synthetic_heat_2d",
    epochs: int = 400,
    n_traj_train: int = 10,
    n_traj_test: int = 2,
    width: int = 32,
    modes: int = 12,
    num_blocks: int = 4,
    lr: float = 2e-3,
    seed: int = 0,
    transfer_resolutions: Sequence[int] = (),
) -> "list[OperatorResult]":
    """TRUE operator learning (VERDICT round-2 item 8): a gridded 2D FNO
    (models/fno_grid.py) learns the one-step time-advance map
    u(., t_i) -> u(., t_{i+1}) from whole-field pairs, and is evaluated on
    HELD-OUT trajectories — unseen input functions, which the point-wise
    reference FNO (reference: fno.py:95-146) cannot generalize to by
    construction. The point-wise run (run_operator_benchmark) remains the
    reference-parity row.

    Always returns a list: ``[primary]`` plus one transfer row per entry in
    ``transfer_resolutions``.
    """
    import jax
    import optax

    from pinnrl_tpu.datasets.synthetic import generate_heat_2d_trajectory
    from pinnrl_tpu.models.fno_grid import GridFNO2D

    trajs = [
        generate_heat_2d_trajectory(i)
        for i in range(n_traj_train + n_traj_test)
    ]

    def make_pairs(traj_list):
        a = np.concatenate([tr[:-1] for tr in traj_list], axis=0)
        u = np.concatenate([tr[1:] for tr in traj_list], axis=0)
        return np.asarray(a, np.float32), np.asarray(u, np.float32)

    a_train, u_train = make_pairs(trajs[:n_traj_train])
    a_test, u_test = make_pairs(trajs[n_traj_train:])

    fno = GridFNO2D(
        in_channels=1, out_channels=1, width=width, modes=modes,
        num_blocks=num_blocks,
    )
    params = fno.init(jax.random.PRNGKey(seed), a_train[:1])
    opt = optax.adam(optax.cosine_decay_schedule(lr, epochs))
    opt_state = opt.init(params)
    n = a_train.shape[0]
    batch = min(16, n)

    # Datasets are EXPLICIT jit arguments, not captured constants: the
    # remote (axon) TPU backend cannot materialize device-resident arrays
    # back to host for MLIR constant embedding.
    def step(carry, _, a_all, u_all):
        params, opt_state, key = carry
        key, kb = jax.random.split(key)
        idx = jax.random.choice(kb, n, (batch,), replace=False)

        def loss_fn(p):
            pred = fno.apply(p, a_all[idx])
            return jnp.mean((pred - u_all[idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    inner = min(50, epochs)
    # Run ceil(epochs/inner) chunks and report the step count actually
    # executed (advisor round-3: epochs//inner silently under-trained, e.g.
    # epochs=75 ran 50 steps while the row claimed 75).
    n_chunks = -(-epochs // inner)
    epochs_run = n_chunks * inner

    @jax.jit
    def chunk(carry, a_all, u_all):
        return jax.lax.scan(
            lambda c, x: step(c, x, a_all, u_all), carry, None, length=inner
        )

    carry = (params, opt_state, jax.random.PRNGKey(seed + 1))
    t0 = time.perf_counter()
    losses = None
    for _ in range(n_chunks):
        carry, losses = chunk(carry, a_train, u_train)
    params = carry[0]
    final_loss = float(jax.block_until_ready(losses)[-1])
    wall = time.perf_counter() - t0

    pred = np.asarray(fno.apply(params, a_test))
    u = np.asarray(u_test)
    rel_l2 = float(np.linalg.norm(pred - u) / (np.linalg.norm(u) + 1e-12))
    primary = OperatorResult(
        dataset=f"{dataset}(gridded)",
        architecture="grid_fno2d",
        mode="operator",
        epochs=epochs_run,
        train_points=int(np.prod(a_train.shape)),
        test_rel_l2=rel_l2,
        test_max_error=float(np.abs(pred - u).max()),
        final_train_loss=final_loss,
        wall_time_s=wall,
        seed=seed,
    )
    # Resolution transfer (the capability models/fno_grid.py:1-15
    # advertises): the spectral conv keeps the SAME `modes` Fourier
    # coefficients at any grid size, so params trained at 48^2 evaluate
    # unchanged on finer grids of the same held-out trajectories.
    results = [primary]
    for res in transfer_resolutions:
        trajs_hi = [
            generate_heat_2d_trajectory(i, nx=int(res), ny=int(res))
            for i in range(n_traj_train, n_traj_train + n_traj_test)
        ]
        a_hi, u_hi = make_pairs(trajs_hi)
        pred_hi = np.asarray(fno.apply(params, a_hi))
        diff = pred_hi - u_hi
        results.append(
            OperatorResult(
                dataset=f"{dataset}(gridded,transfer{int(res)})",
                architecture="grid_fno2d",
                mode="operator",
                epochs=epochs_run,
                train_points=int(np.prod(a_train.shape)),
                test_rel_l2=float(
                    np.linalg.norm(diff) / (np.linalg.norm(u_hi) + 1e-12)
                ),
                test_max_error=float(np.abs(diff).max()),
                final_train_loss=final_loss,
                wall_time_s=wall,
                seed=seed,
            )
        )
    return results


def results_to_csv(results: Sequence[OperatorResult]) -> str:
    header = (
        "dataset,architecture,mode,epochs,train_points,test_rel_l2,"
        "test_max_error,final_train_loss,wall_time_s,seed"
    )
    rows = [
        f"{r.dataset},{r.architecture},{r.mode},{r.epochs},{r.train_points},"
        f"{r.test_rel_l2:.6e},{r.test_max_error:.6e},{r.final_train_loss:.6e},"
        f"{r.wall_time_s:.1f},{r.seed}"
        for r in results
    ]
    return "\n".join([header, *rows]) + "\n"
