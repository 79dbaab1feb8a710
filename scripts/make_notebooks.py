"""Generate the round-4 example notebooks (VERDICT r3 next-step 7).

Counterparts of the reference's 02_comparing_architectures /
03_rl_vs_uniform_sampling / 04_well_dataset_quickstart notebooks
(reference: /notebooks/*.ipynb), re-authored against the TPU-native API.
Run scripts/exec_notebooks.py afterwards to execute them in place.
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "notebooks"


_CELL_N = [0]


def _cid() -> str:
    _CELL_N[0] += 1
    return f"cell-{_CELL_N[0]:03d}"


def md(src: str) -> dict:
    return {"cell_type": "markdown", "id": _cid(), "metadata": {},
            "source": src.splitlines(keepends=True)}


def code(src: str) -> dict:
    return {
        "cell_type": "code", "id": _cid(), "metadata": {},
        "execution_count": None,
        "outputs": [], "source": src.splitlines(keepends=True),
    }


def notebook(cells) -> dict:
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


# --------------------------------------------------------------------- #
# 1. Architecture shootout
# --------------------------------------------------------------------- #

ARCH_CELLS = [
    md("""# Architecture shootout: 7 networks on the Burgers equation

Every architecture the framework ships — `feedforward`, `resnet`, `siren`,
`fourier`, `fno`, `attention`, `autoencoder` — trained on the same viscous
Burgers problem with the same budget, through the same `PDETrainer`.

Two things to watch:

1. **Spectral bias.** Burgers develops a steep front; plain MLPs resolve it
   slowly. Fourier features and SIREN put high frequencies into the basis.
2. **The TPU fast path.** For `fourier`/`feedforward` trunks the trainer
   attaches the stacked-jet bundle (`ops/jet_mlp.py`): all derivative
   streams ride one matmul per layer. Other architectures fall back to the
   general nested-jvp engine — correct, but more MXU launches per step.
"""),
    code("""import time

import jax
import matplotlib.pyplot as plt
import numpy as np

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer

print(jax.default_backend(), jax.devices())"""),
    md("""## Configure one Burgers problem, seven models

Small budget on purpose (600 epochs, 4k points) so the whole sweep runs in
minutes; the shipped benchmark recipes (`pinnrl_tpu/benchmarks/convergence.py`)
are the converged versions of the winner."""),
    code("""ARCHES = ["feedforward", "resnet", "siren", "fourier", "fno",
          "attention", "autoencoder"]
EPOCHS = 2000  # full sweep sized for a TPU; on CPU drop to ~400

from pinnrl_tpu.benchmarks.convergence import RECIPES

def pose_burgers(cfg):
    # Overlay the benchmark recipe's PDE block (tanh traveling wave):
    # the raw config block's target is ill-posed for residual training —
    # same overlay the sampling harness applies (benchmarks/sampling.py).
    for k, v in (RECIPES["burgers"].get("pde") or {}).items():
        if k == "parameters":
            cfg.pde.parameters.update(v)
        else:
            setattr(cfg.pde, k, v)

results = {}
for arch in ARCHES:
    cfg = load_config(pde_type="burgers", architecture=arch)
    pose_burgers(cfg)
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params.setdefault("mapping_size", 64)
    t = cfg.training
    t.num_epochs = EPOCHS
    t.num_collocation_points = 2048
    t.batch_size = 512
    t.validation_frequency = max(EPOCHS // 10, 1)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    res = trainer.train(seed=0)
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]
    val = pde.validate(model.apply, params, num_points=5000)
    results[arch] = {
        "history": trainer.history,
        "rel_l2": float(val["rel_l2"]),
        "wall_s": wall,
        "params": params,
        "model": model,
        "fast_path": pde._fast_bundle_fn is not None,
    }
    pde.attach_fast_bundle(model, enable=False)
    print(f"{arch:12s} rel-L2 {val['rel_l2']:.3e}  {wall:6.1f}s"
          f"  fast-path={results[arch]['fast_path']}")"""),
    md("## Loss curves"),
    code("""fig, ax = plt.subplots(figsize=(8, 4.5))
for arch, r in results.items():
    ax.semilogy(r["history"]["train_loss"], label=arch, lw=1.2)
ax.set_xlabel("epoch"); ax.set_ylabel("total loss")
ax.legend(ncol=2, fontsize=8); ax.set_title("Training loss by architecture")
plt.tight_layout(); plt.show()"""),
    md("## Final accuracy and cost"),
    code("""order = sorted(results, key=lambda a: results[a]["rel_l2"])
fig, ax = plt.subplots(figsize=(8, 3.5))
ax.barh([a for a in order], [results[a]["rel_l2"] for a in order])
ax.set_xscale("log"); ax.set_xlabel("validation rel-L2 (log)")
ax.set_title("Lower is better")
plt.tight_layout(); plt.show()

print(f"{'arch':12s} {'rel_l2':>10s} {'wall_s':>8s} {'fast_path':>9s}")
for a in order:
    r = results[a]
    print(f"{a:12s} {r['rel_l2']:10.3e} {r['wall_s']:8.1f} {str(r['fast_path']):>9s}")"""),
    md("""## Best two vs the exact solution at t = 0.5"""),
    code("""import jax.numpy as jnp

best = order[:2]
cfg = load_config(pde_type="burgers", architecture="fourier")
pose_burgers(cfg)
pde = create_pde(cfg)
x = np.linspace(*cfg.pde.domain[0], 400).reshape(-1, 1)
t_mid = np.full_like(x, 0.5)
exact = np.asarray(pde.exact_solution(jnp.asarray(x), jnp.asarray(t_mid)))

fig, ax = plt.subplots(figsize=(8, 4))
ax.plot(x, exact, "k-", lw=2, label="exact")
for a in best:
    r = results[a]
    z = jnp.concatenate([jnp.asarray(x, jnp.float32),
                         jnp.asarray(t_mid, jnp.float32)], axis=-1)
    u = np.asarray(r["model"].apply(r["params"], z)).reshape(-1, exact.shape[-1])[:, :1]
    ax.plot(x, u, "--", lw=1.2, label=a)
ax.set_xlabel("x"); ax.set_ylabel("u(x, 0.5)"); ax.legend()
ax.set_title("Burgers front at t = 0.5: top-2 architectures vs exact")
plt.tight_layout(); plt.show()"""),
    md("""## What to take away

- **At this modest budget the ranking is tighter than folklore suggests**:
  the executed run above shows `fno`, `resnet`, `siren` and `feedforward`
  all reaching a few-1e-4 rel-L2 on the recipe-posed traveling wave, with
  `fourier` mid-pack — the *pinned-basis* Fourier configs that win the
  shipped benchmark recipes use tuned per-PDE `scale`/`mapping_size`
  (see `pinnrl_tpu/benchmarks/convergence.py`), not the defaults used
  here. Basis tuning, not architecture, is the first-order lever.
- **`attention` / `autoencoder` trail badly in residual training** — they
  are data-mode architectures (gridded field regression; see the Well
  quickstart notebook), not point-wise PINN trunks.
- Wall-clock differences are dominated by whether the stacked-jet fast
  path attached (`fast-path=True`: all derivative streams ride one matmul
  per layer) and by per-architecture compile costs — see
  `docs/performance.md` for the roofline analysis.
- For converged per-PDE results (all < 1e-3 on 3 seeds) use the shipped
  recipes: `python -m pinnrl_tpu.benchmarks.cli convergence --pde ...`.
"""),
]


# --------------------------------------------------------------------- #
# 2. RL vs uniform sampling
# --------------------------------------------------------------------- #

RL_CELLS = [
    md("""# RL-guided vs uniform collocation sampling

The framework's namesake feature: a DQN (`rl/dqn.py`, fully on-device —
replay buffer, target net and TD updates all live inside the jitted epoch)
scores candidate collocation points and concentrates sampling where the
residual is informative.

This notebook trains three *identical* models on a **sharp-front Burgers**
problem (ν = 0.004) — the regime where the 20-seed paired study
(`benchmark_results/sampling_r3.csv`) found adaptivity pays — differing
only in sampling strategy:

| strategy | mechanism |
|---|---|
| `uniform` | i.i.d. uniform over the domain |
| `residual_based` (RAR) | Gumbel top-k without replacement, residual-biased |
| `adaptive` (RL) | DQN-scored sampling over a candidate pool |

Honest scoping up front: on *easy* (well-resolved) fronts, residual bias
**hurts** — see `benchmark_results/README.md` for the full regime map.
"""),
    code("""import time

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.rl import RLAgent
from pinnrl_tpu.training import PDETrainer

print(jax.default_backend(), jax.devices())"""),
    md("## One sharp-front problem, three samplers"),
    code("""EPOCHS = 6000
STRATEGIES = ["uniform", "residual_based", "adaptive"]

from pinnrl_tpu.benchmarks.convergence import RECIPES

def make_cfg(strategy):
    cfg = load_config(pde_type="burgers", architecture="fourier")
    # Pose on the recipe's traveling-wave target (see sampling harness),
    # then sharpen the front.
    for k, v in (RECIPES["burgers"].get("pde") or {}).items():
        if k == "parameters":
            cfg.pde.parameters.update(v)
        else:
            setattr(cfg.pde, k, v)
    cfg.pde.parameters["nu"] = 0.004          # sharp front
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params["mapping_size"] = 64
    t = cfg.training
    t.num_epochs = EPOCHS
    t.num_collocation_points = 4096
    t.batch_size = 1024
    t.collocation_distribution = strategy
    t.validation_frequency = max(EPOCHS // 10, 1)
    if strategy == "adaptive":
        cfg.rl.enabled = True
    return cfg

runs = {}
for strategy in STRATEGIES:
    cfg = make_cfg(strategy)
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    agent = (RLAgent(state_dim=cfg.model.input_dim, hidden_dim=32,
                     memory_size=1024, batch_size=64)
             if strategy == "adaptive" else None)
    trainer = PDETrainer(model, pde, cfg, rl_agent=agent)
    t0 = time.perf_counter()
    trainer.train(seed=0)
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]
    val = pde.validate(model.apply, params, num_points=5000)
    runs[strategy] = {"history": trainer.history, "rel_l2": float(val["rel_l2"]),
                      "wall_s": wall, "model": model, "params": params,
                      "trainer": trainer, "pde": pde}
    print(f"{strategy:15s} rel-L2 {val['rel_l2']:.3e}  {wall:6.1f}s")"""),
    md("## Loss curves"),
    code("""fig, ax = plt.subplots(figsize=(8, 4.5))
for s, r in runs.items():
    ax.semilogy(r["history"]["train_loss"], label=s, lw=1.2)
ax.set_xlabel("epoch"); ax.set_ylabel("total loss"); ax.legend()
ax.set_title("Sharp-front Burgers (nu = 0.004): sampling strategies")
plt.tight_layout(); plt.show()"""),
    md("""## Where does each sampler put its points?

Draw one final batch per strategy from the trained state. RAR and the RL
agent should both pile points onto the moving front near x ≈ 0."""),
    code("""fig, axes = plt.subplots(1, 3, figsize=(12, 3.2), sharey=True)
for ax, (s, r) in zip(axes, runs.items()):
    pde, model, params = r["pde"], r["model"], r["params"]
    key = jax.random.PRNGKey(7)
    if s == "residual_based":
        res_fn = lambda xx, tt: pde.residual_score(
            model.apply, params, xx, tt)
        x, t = pde.generate_collocation_points(key, 2048, "residual_based",
                                               residual_fn=res_fn)
    elif s == "adaptive":
        agent = r["trainer"].rl_agent
        rl_state = r["trainer"]._final_state["rl"]
        k1, k2 = jax.random.split(key)
        x, t = pde.generate_collocation_points(
            k2, 2048, "adaptive", score_fn=agent.score_fn(rl_state, k1))
    else:
        x, t = pde.generate_collocation_points(key, 2048, "uniform")
    ax.scatter(np.asarray(t), np.asarray(x), s=1, alpha=0.4)
    ax.set_title(s); ax.set_xlabel("t")
axes[0].set_ylabel("x")
fig.suptitle("Final collocation batches", y=1.02)
plt.tight_layout(); plt.show()"""),
    md("## Error over space-time"),
    code("""fig, axes = plt.subplots(1, 3, figsize=(12, 3.4), sharey=True)
cfg = make_cfg("uniform")
xg = np.linspace(*cfg.pde.domain[0], 160)
tg = np.linspace(*cfg.pde.time_domain, 160)
X, T = np.meshgrid(xg, tg, indexing="ij")
zz = jnp.asarray(np.stack([X.ravel(), T.ravel()], -1), jnp.float32)
pde0 = runs["uniform"]["pde"]
exact = np.asarray(pde0.exact_solution(zz[:, :1], zz[:, 1:])).reshape(X.shape)
ims = []
for ax, (s, r) in zip(axes, runs.items()):
    u = np.asarray(r["model"].apply(r["params"], zz))
    u = u.reshape(-1)[: X.size].reshape(X.shape) if u.ndim == 1 else \\
        u.reshape(X.shape[0], X.shape[1], -1)[..., 0]
    err = np.abs(u - exact)
    im = ax.pcolormesh(T, X, err, cmap="magma", shading="auto")
    ims.append(im)
    ax.set_title(f"{s}  (rel-L2 {r['rel_l2']:.2e})"); ax.set_xlabel("t")
axes[0].set_ylabel("x")
fig.colorbar(ims[-1], ax=axes, label="|error|", shrink=0.85)
plt.show()"""),
    md("""## When does RL help? (and an honest note on this run)

**Note on the numbers above:** at this notebook's budget (a 64-wide net,
one batch per epoch) the ν = 0.004 front is *under-resolved for every
strategy* — rel-L2 stays O(1). That is precisely why this regime
discriminates samplers in the tracked studies: they measure the paired
**ratio** between strategies over 20 seeds at 10k steps, not absolute
convergence. A single notebook run is illustrative, not evidence.

The measured answers from the paired studies
(`benchmark_results/sampling_r3.csv`, `sampling_r4.csv`, analysis in
`benchmark_results/README.md`):

- **KdV (dispersive, long horizon):** RAR 0.79 [0.64, 0.98] vs uniform —
  the clearest adaptivity win.
- **Sharp front:** RAR ≈ 0.81, RL-adaptive ≈ 0.84 vs uniform — both beat
  uniform, statistically indistinguishable from each other.
- **Easy, well-resolved fronts:** residual bias *hurts* (≈1.28 against);
  uniform is the right default.
- **Round 4** handed the DQN strictly more information than RAR
  (residual-as-feature variant) and a learning-progress reward: neither
  beats tuned RAR — the full conclusion and recommendation table live in
  `benchmark_results/README.md`.
"""),
]


# --------------------------------------------------------------------- #
# 3. Well dataset quickstart
# --------------------------------------------------------------------- #

WELL_CELLS = [
    md("""# Quickstart: "The Well" datasets

The framework mirrors the reference's Well integration (registry → lazy
loader → flattened point cloud → npz cache → `data_only` training). This
environment has **no network egress**, so the notebook exercises the
pipeline through the clearly-marked synthetic stand-in dataset
(`synthetic_heat_2d`) — it flows through byte-identical loader/cache code;
swap the name for any registry entry on a machine with `the_well`
installed.
"""),
    code("""import jax
import matplotlib.pyplot as plt
import numpy as np

from pinnrl_tpu.datasets import (WELL_REGISTRY, get_entry, list_dataset_names,
                                 load_well_slice)
from pinnrl_tpu.datasets.synthetic import ensure_synthetic_well_cache

print(jax.default_backend())
for name in list_dataset_names():
    e = get_entry(name)
    print(f"{name:28s} dims={e.n_spatial_dims} fields={e.fields}")"""),
    md("## Load a slice (synthetic cache → identical loader path)"),
    code("""ensure_synthetic_well_cache("synthetic_heat_2d", split="train",
                            n_traj=1, n_points=8192, seed=0)
ensure_synthetic_well_cache("synthetic_heat_2d", split="test",
                            n_traj=1, n_points=8192, seed=0)
train = load_well_slice("synthetic_heat_2d", split="train", n_traj=1,
                        n_points=8192, seed=0)
test = load_well_slice("synthetic_heat_2d", split="test", n_traj=1,
                       n_points=8192, seed=0)
print({k: v.shape for k, v in train.items()})"""),
    md("""## Train in `data_only` mode

`data_only` gates the physics losses off entirely — pure regression of
u(x, y, t) from scattered samples, exactly the reference's Well training
mode (reference: pinnrl/training/train.py:104-149)."""),
    code("""from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer

entry = get_entry("synthetic_heat_2d")
# fourier instead of the registry's default point-wise FNO: same data-mode
# task, ~5x faster per step on CPU (this notebook must also run without a
# TPU); swap back to entry.default_architecture on real hardware.
cfg = load_config(pde_type=entry.default_pde_key or "heat",
                  architecture="fourier")
cfg.model.hidden_dims = [64, 64, 64]
# Regression-tuned basis: the heat_2d YAML block's scale=4.0 targets PDE
# residual training; for smooth-field regression it aliases badly on 8k
# scattered samples (measured rel-L2 ~0.8). scale=0.5 fits the two-mode
# decaying field.
cfg.model.arch_params.update({"mapping_size": 64, "scale": 0.5})
# Registry-defaults overlay — the same contract `pinnrl-train --dataset`
# applies (training/train.py:140-158): the model must be posed on the
# DATASET's domain, not the PDE config block's.
cfg.pde.dimension = entry.n_spatial_dims
cfg.pde.domain = [list(d) for d in entry.domain]
cfg.pde.time_domain = list(entry.time_domain)
cfg.model.input_dim = entry.default_input_dim
cfg.model.output_dim = entry.default_output_dim
t = cfg.training
t.mode = entry.recommended_mode
t.num_epochs = 2000
t.batch_size = 1024
t.num_collocation_points = 8192
t.validation_frequency = 200

pde = create_pde(cfg)
pde.set_observations(train["x"], train["t"], train["u"])
model = PINNModel(cfg, seed=0)
trainer = PDETrainer(model, pde, cfg)
res = trainer.train(seed=0)
params = trainer._final_state["params"]["net"]
print("status:", res["status"])"""),
    md("## Held-out error (disjoint grid points, same trajectory)"),
    code("""import jax.numpy as jnp

z = jnp.asarray(np.concatenate([test["x"], test["t"]], axis=1), jnp.float32)
pred = np.asarray(model.apply(params, z)).reshape(len(test["u"]), -1)[:, :1]
u = test["u"].reshape(len(test["u"]), -1)[:, :1]
rel_l2 = np.linalg.norm(pred - u) / np.linalg.norm(u)
print(f"held-out rel-L2: {rel_l2:.3e}")"""),
    md("## Prediction vs reference at the final time"),
    code("""entry = get_entry("synthetic_heat_2d")
(x_lo, x_hi), (y_lo, y_hi) = entry.domain
t_hi = entry.time_domain[1]
n = 64
xg = np.linspace(x_lo, x_hi, n); yg = np.linspace(y_lo, y_hi, n)
X, Y = np.meshgrid(xg, yg, indexing="ij")
zz = jnp.asarray(np.stack([X.ravel(), Y.ravel(),
                           np.full(X.size, t_hi)], -1), jnp.float32)
pred = np.asarray(model.apply(params, zz)).reshape(n, n, -1)[..., 0]

from pinnrl_tpu.datasets.synthetic import generate_heat_2d_trajectory
ref = generate_heat_2d_trajectory(0, n_steps=24, nx=n, ny=n)[-1, :, :, 0]

fig, axes = plt.subplots(1, 3, figsize=(12, 3.4))
for ax, (f, title) in zip(axes, [(ref, "reference"), (pred, "prediction"),
                                 (np.abs(pred - ref), "|error|")]):
    im = ax.pcolormesh(X, Y, f, shading="auto",
                       cmap="magma" if title == "|error|" else "viridis")
    fig.colorbar(im, ax=ax); ax.set_title(title)
plt.tight_layout(); plt.show()"""),
    md("""## Using a real Well dataset

On a machine with egress + `pip install the_well`, the identical calls work
against any of the 12 registry entries, e.g.:

```python
train = load_well_slice("acoustic_scattering_maze", split="train",
                        n_traj=2, n_points=16384)
```

or through the CLI:

```bash
python -m pinnrl_tpu.training.train --pde wave \\
    --dataset acoustic_scattering_maze --mode data_only
```

The gridded operator-learning path (train an FNO on *whole fields*, not
point clouds) lives in `pinnrl_tpu/benchmarks/operator.py` — see
`models/fno_grid.py` for resolution-transfer evaluation.
"""),
]


def main() -> None:
    for name, cells in [
        ("architectures_comparison", ARCH_CELLS),
        ("rl_vs_uniform_sampling", RL_CELLS),
        ("well_quickstart", WELL_CELLS),
    ]:
        path = OUT / f"{name}.ipynb"
        path.write_text(json.dumps(notebook(cells), indent=1))
        print("wrote", path)


if __name__ == "__main__":
    main()
