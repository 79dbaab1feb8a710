"""Convergence benchmark: rel-L2 vs exact solution for tuned per-PDE recipes.

The reference's roadmap lists "Reproducible benchmark artifacts" as TODO
(reference: docs/roadmap.md:96-105); this harness delivers them. Each PDE
gets a tuned recipe (architecture + points + optimizer schedule) known to
reach the north-star accuracy budget on one TPU chip; the harness trains it
and reports rel-L2 / max error / wall time / pts-per-sec as a CSV row.

Run:  python -m pinnrl_tpu.benchmarks.cli convergence --pde heat
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer


@dataclass
class ConvergenceResult:
    pde: str
    architecture: str
    epochs: int
    rel_l2: float
    max_error: float
    final_train_loss: float
    wall_time_s: float
    points_per_sec: float
    seed: int


# Tuned recipes: (arch, model overrides, training overrides).
RECIPES: Dict[str, dict] = {
    "heat": dict(
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.4,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "kdv": dict(
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        # Recipe history (measured, seed 0): f32 adam plateaus at 3.7e-3 and
        # then OVERFITS the f32 jet-noise (3000 epochs: loss 1.6e-7 but
        # rel-L2 back up to 5.0e-3); a fixed-batch f64 L-BFGS polish
        # overfits its own 2048-pt batch (loss 7e-8, rel-L2 5.1e-3). The
        # escape is phase-2 ADAM with FRESH per-step batches in f64 (on the
        # host CPU backend — XLA:TPU has no native f64): the only variant
        # where lower train loss keeps lowering whole-domain rel-L2.
        training=dict(
            num_epochs=2000, num_collocation_points=40000, batch_size=8192,
            # 1500 fully-annealed f32 adam epochs (phase-1 cosine spans its
            # own phase) + 500 f64 fresh-batch adam epochs at 3e-4 cosine->0.
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.75,
            phase2_optimizer="adam", phase2_learning_rate=3e-4,
            num_boundary_points=4096, num_initial_points=4096,
            learning_rate=2e-3, weight_decay=0.0,
            residual_dtype="float64",
            lbfgs_batch_size=2048,  # phase-2 per-step batch
        ),
    ),
    "wave": dict(
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=1e-3, weight_decay=0.0,
            loss_weights={"residual": 1.0, "boundary": 100.0, "initial": 100.0,
                          "smoothness": 0.0, "data": 10.0},
        ),
    ),
    "burgers": dict(
        # Genuine viscous-shock traveling wave (the reference's Cole-Hopf
        # variant has tan-poles inside the domain and its "tanh" variant is
        # not an exact solution — burgers.py documents both). The moving
        # front is steep (width 4*nu/a = 0.08), the regime RAR/DQN sampling
        # exists for.
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        pde=dict(
            parameters={"nu": 0.01},
            exact_solution={"type": "traveling_wave", "amplitude": 0.5,
                            "speed": 0.5, "center": -0.25},
            initial_condition={"type": "traveling_wave"},
        ),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
            collocation_distribution="residual_based",
        ),
    ),
    "heat_2d": dict(
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=8192, num_initial_points=8192,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
}


def run_convergence(
    pde_key: str,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> ConvergenceResult:
    recipe = RECIPES[pde_key]
    cfg = load_config(pde_type=pde_key, architecture=recipe["arch"])
    for k, v in (recipe.get("pde") or {}).items():
        if k == "parameters":
            cfg.pde.parameters.update(v)
        else:
            setattr(cfg.pde, k, v)
    m = recipe["model"]
    cfg.model.hidden_dims = list(m.get("hidden_dims", cfg.model.hidden_dims))
    for k in ("mapping_size", "scale", "omega_0", "hidden_dim", "num_blocks"):
        if k in m:
            cfg.model.arch_params[k] = m[k]
    t = cfg.training
    tr_over = dict(recipe["training"])
    t.optimizer_config.learning_rate = tr_over.pop("learning_rate", 2e-3)
    t.optimizer_config.weight_decay = tr_over.pop("weight_decay", 0.0)
    if "loss_weights" in tr_over:
        t.loss_weights.update(tr_over.pop("loss_weights"))
    if "lbfgs_batch_size" in tr_over:
        t.lbfgs.batch_size = tr_over.pop("lbfgs_batch_size")
    if "lbfgs_resample_every" in tr_over:
        t.lbfgs.resample_every = tr_over.pop("lbfgs_resample_every")
    for k, v in tr_over.items():
        setattr(t, k, v)
    if epochs:
        t.num_epochs = epochs
    t.early_stopping.enabled = False
    t.loss_weights["smoothness"] = 0.0
    t.validation_frequency = max(t.num_epochs // 4, 1)

    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    res = trainer.train(seed=seed)
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]
    val = pde.validate(model.apply, params, num_points=20000)
    steps = len(trainer.history["train_loss"]) * max(
        t.num_collocation_points // min(t.batch_size, t.num_collocation_points), 1
    )
    return ConvergenceResult(
        pde=pde_key,
        architecture=recipe["arch"],
        epochs=t.num_epochs,
        rel_l2=val.get("rel_l2", float("nan")),
        max_error=val.get("max_error", float("nan")),
        final_train_loss=res["final_train_loss"],
        wall_time_s=wall,
        points_per_sec=steps * min(t.batch_size, t.num_collocation_points) / wall,
        seed=seed,
    )


def results_to_csv(results: Sequence[ConvergenceResult]) -> str:
    header = "pde,architecture,epochs,rel_l2,max_error,final_train_loss,wall_time_s,points_per_sec,seed"
    rows = [
        f"{r.pde},{r.architecture},{r.epochs},{r.rel_l2:.6e},{r.max_error:.6e},"
        f"{r.final_train_loss:.6e},{r.wall_time_s:.1f},{r.points_per_sec:.0f},{r.seed}"
        for r in results
    ]
    return "\n".join([header, *rows]) + "\n"
