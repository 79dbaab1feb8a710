"""Multi-stage PINN training: frozen base solution + scaled correction nets.

New capability beyond the reference (which trains a single network per run;
reference trainer: pinnrl/training/trainer.py:391-963). Technique: train a
stage-1 PINN as usual, freeze it, then train a stage-2 network on the SAME
physics losses through the composed predictor

    u(z) = u_base(z) + eps * net_2(z)

where ``eps`` is the magnitude of the stage-1 error. Because the correction
net's O(1) output is pre-scaled to the error's magnitude, its optimization
is as well-conditioned as stage 1's was for the solution itself, and the
higher-frequency error field gets its own (typically higher-``scale``)
Fourier basis. This is the standard route past a single net's accuracy
floor (Wang & Lai, "Multi-stage neural networks: accurate function
approximation", 2023) — each stage multiplies accuracy rather than adding
capacity.

TPU notes: the composition happens inside ``PINNModel.output_transform``,
the single forward choke point, so the fused ``lax.scan`` training step,
the forward-mode derivative engine (tangents flow through the frozen base
via the chain rule — no ``stop_gradient``, which would also sever the
input-tangents the residual needs), data-parallel sharding, and every
sampling strategy work unchanged for any number of stages. Parameter
gradients touch only the live stage's pytree because the frozen base
params enter the trace as constants, not as optimizer leaves.
"""

from __future__ import annotations

import copy
import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from pinnrl_tpu.config import Config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training.trainer import PDETrainer

__all__ = ["StageSpec", "MultiStageResult", "correction_model", "run_multistage"]


@dataclass
class StageSpec:
    """Overrides for one correction stage (all optional).

    ``eps``: correction amplitude; ``None`` = auto (RMS error vs the exact
    solution when one exists, else sqrt of the stage's final train loss).
    ``scale_mult``: multiply the Fourier-feature ``scale`` of the previous
    stage (the error field is higher-frequency than the solution).
    """

    epochs: Optional[int] = None
    eps: Optional[float] = None
    scale: Optional[float] = None
    scale_mult: float = 2.0
    mapping_size: Optional[int] = None
    hidden_dims: Optional[List[int]] = None
    learning_rate: Optional[float] = None
    optimizer: Optional[str] = None
    extra_model: Dict[str, Any] = field(default_factory=dict)


@dataclass
class MultiStageResult:
    apply_fn: Callable
    params: Any
    models: List[PINNModel]
    stage_metrics: List[Dict[str, float]]
    eps_history: List[float]


def correction_model(
    config: Config,
    base_apply: Callable,
    base_params,
    eps: float,
    seed: int = 0,
) -> PINNModel:
    """A PINNModel whose output is ``base_apply(base_params, z) + eps*net(z)``.

    ``base_apply``/``base_params`` are closed over (frozen): the trainer
    optimizes only the new model's params. Input tangents still flow through
    the base — required for residual derivatives of the composed solution.
    """
    model = PINNModel(config, seed=seed)

    def transform(z, out):
        return base_apply(base_params, z) + eps * out

    model.output_transform = transform
    return model


def _stage_config(cfg: Config, spec: StageSpec) -> Config:
    cfg2 = copy.deepcopy(cfg)
    t = cfg2.training
    if spec.epochs is not None:
        t.num_epochs = spec.epochs
        t.validation_frequency = max(spec.epochs // 4, 1)
    if spec.learning_rate is not None:
        t.optimizer_config.learning_rate = spec.learning_rate
    if spec.optimizer is not None:
        t.optimizer = spec.optimizer
    ap = cfg2.model.arch_params
    if spec.scale is not None:
        ap["scale"] = spec.scale
    elif "scale" in ap:
        ap["scale"] = float(ap["scale"]) * spec.scale_mult
    if spec.mapping_size is not None:
        ap["mapping_size"] = spec.mapping_size
    if spec.hidden_dims is not None:
        cfg2.model.hidden_dims = list(spec.hidden_dims)
    ap.update(spec.extra_model)
    # A correction stage trains a fresh single net on fixed composed
    # predictors: ensembling/EMA of the base does not compose stage-wise.
    t.ensemble_size = 1
    return cfg2


def _auto_eps(pde, apply_fn, params, final_train_loss: float) -> float:
    """Error magnitude for the next correction stage."""
    val = pde.validate(apply_fn, params, num_points=4096)
    l2 = val.get("l2_error", float("nan"))  # mean SQUARED error (ref parity)
    if math.isfinite(l2) and l2 > 0.0:
        return math.sqrt(l2)
    if math.isfinite(final_train_loss) and final_train_loss > 0.0:
        return math.sqrt(final_train_loss)
    return 1e-3


def run_multistage(
    cfg: Config,
    stages: List[StageSpec],
    seed: int = 0,
    pde=None,
) -> MultiStageResult:
    """Train stage 0 from ``cfg``, then each correction stage in ``stages``.

    Returns the composed predictor of the LAST stage: ``apply_fn(params, z)``
    evaluates base + all corrections (each stage's ``output_transform``
    closes over the full predictor below it).
    """
    pde = pde if pde is not None else create_pde(cfg)
    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    res = trainer.train(seed=seed)
    params = trainer._final_state["params"]["net"]

    models = [model]
    metrics = [pde.validate(model.apply, params, num_points=20000)]
    eps_hist: List[float] = []
    apply_fn, cur_params = model.apply, params
    final_loss = res["final_train_loss"]

    for i, spec in enumerate(stages):
        eps = spec.eps if spec.eps is not None else _auto_eps(
            pde, apply_fn, cur_params, final_loss
        )
        eps_hist.append(float(eps))
        cfg_i = _stage_config(cfg, spec)
        stage_seed = seed + 101 * (i + 1)
        m = correction_model(cfg_i, apply_fn, cur_params, float(eps), seed=stage_seed)
        tr = PDETrainer(m, pde, cfg_i)
        res = tr.train(seed=stage_seed)
        cur_params = tr._final_state["params"]["net"]
        apply_fn = m.apply
        final_loss = res["final_train_loss"]
        models.append(m)
        metrics.append(pde.validate(apply_fn, cur_params, num_points=20000))

    return MultiStageResult(
        apply_fn=apply_fn,
        params=cur_params,
        models=models,
        stage_metrics=metrics,
        eps_history=eps_hist,
    )
