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
