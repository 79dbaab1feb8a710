"""Experiment-directory file protocol.

Keeps the reference's exact on-disk contract so the dashboard (and any
external tooling written against pinnrl) keeps working:
- ``history.json`` + ``metrics.json`` + merged ``metadata.json``
  (reference: pinnrl/utils/utils.py:734-795)
- ``live_snapshot.npz`` with 60x60 ``u_pred``/``residual`` grids
  (reference: pinnrl/training/trainer.py:171-279)
- model save/load with a JSON config sidecar (reference: utils/utils.py:79-137)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _to_serializable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_serializable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def save_training_metrics(experiment_dir: str | Path, history: Dict[str, Any]) -> None:
    """Write history.json and metrics.json (reference: utils/utils.py:734-795)."""
    exp = Path(experiment_dir)
    exp.mkdir(parents=True, exist_ok=True)
    hist = _to_serializable(history)
    (exp / "history.json").write_text(json.dumps(hist, default=str))
    metrics = {
        "final_train_loss": hist["train_loss"][-1] if hist.get("train_loss") else None,
        "final_val_loss": hist["val_loss"][-1] if hist.get("val_loss") else None,
        "num_epochs_run": len(hist.get("train_loss", [])),
        "loss_components": {
            k: (v[-1] if v else None)
            for k, v in hist.get("loss_components", {}).items()
        },
    }
    (exp / "metrics.json").write_text(json.dumps(metrics, default=str))


def save_live_snapshot(
    experiment_dir: str | Path,
    pde,
    model,
    params: Dict[str, Any],
    grid: int = 60,
) -> None:
    """60x60 prediction + residual grids for live monitoring
    (reference: trainer.py:171-279). 1D: x-t plane; 2D: x1-x2 at mid-time.
    Exceptions are swallowed like the reference (monitoring must not kill
    training)."""
    try:
        exp = Path(experiment_dir)
        net = params["net"] if isinstance(params, dict) and "net" in params else params
        coeffs = params.get("coeffs") if isinstance(params, dict) else None
        if pde.dimension == 1:
            xs = jnp.linspace(pde.domain[0][0], pde.domain[0][1], grid)
            ts = jnp.linspace(pde.time_domain[0], pde.time_domain[1], grid)
            X, T = jnp.meshgrid(xs, ts, indexing="ij")
            x_flat = X.reshape(-1, 1)
            t_flat = T.reshape(-1, 1)
        else:
            xs = jnp.linspace(pde.domain[0][0], pde.domain[0][1], grid)
            ys = jnp.linspace(pde.domain[1][0], pde.domain[1][1], grid)
            X, Y = jnp.meshgrid(xs, ys, indexing="ij")
            mid_t = 0.5 * (pde.time_domain[0] + pde.time_domain[1])
            extra = [
                jnp.full((grid * grid, 1), 0.5 * (lo + hi))
                for lo, hi in pde.domain[2:]
            ]
            x_flat = jnp.concatenate(
                [X.reshape(-1, 1), Y.reshape(-1, 1), *extra], axis=1
            )
            t_flat = jnp.full((grid * grid, 1), mid_t)
        u = model.apply(net, jnp.concatenate([x_flat, t_flat], axis=-1))
        u = np.asarray(u).reshape(grid, grid, -1)[..., 0]
        res = pde.compute_residual(model.apply, net, x_flat, t_flat, coeffs)
        res = np.asarray(res).reshape(grid, grid)
        np.savez(
            exp / "live_snapshot.npz",
            u_pred=u,
            residual=res,
            x=np.asarray(xs),
            y_or_t=np.asarray(ts if pde.dimension == 1 else ys),
            dimension=pde.dimension,
        )
    except Exception:  # pragma: no cover - monitoring best-effort
        pass


def save_model(path: str | Path, model, config: Dict[str, Any] | None = None) -> None:
    """Model + JSON config sidecar (reference: utils/utils.py:79-137)."""
    model.save_state(str(path))
    if config is not None:
        Path(path).with_suffix(".config.json").write_text(
            json.dumps(_to_serializable(config), indent=2, default=str)
        )


def load_model(path: str | Path, model):
    model.load_state(str(path))
    return model
