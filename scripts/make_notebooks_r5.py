"""Generate the two round-5 example notebooks (VERDICT r4 job #5):

- sampling_techniques.ipynb — counterpart of the reference's
  notebooks/sampling_techniques.ipynb, built on this repo's MEASURED
  20-seed paired studies (benchmark_results/sampling_r3/r4.csv) rather
  than qualitative scatter plots alone.
- pinn_intro_workshop.ipynb — counterpart of the reference's
  notebooks/PINN_intro_workshop.ipynb (forward task, inverse task,
  high-frequency scaling + ansatz), re-authored on the pendulum ODE
  through the TPU-native API.

Run scripts/exec_notebooks.py afterwards to execute them in place.
"""

from __future__ import annotations

import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent))

from make_notebooks import OUT, code, md, notebook  # noqa: E402

SAMPLING_CELLS = [
    md("""# Sampling techniques for PINN collocation points

Where you place collocation points changes what the residual loss can see.
This notebook shows the four strategies the framework ships
(`pinnrl_tpu/sampling/strategies.py` — counterpart of the reference's
`sampling_techniques.ipynb` notebook and `pde_base.py` samplers), then
reads the repo's *measured* multi-seed studies to answer the question the
qualitative plots can't: **when does adaptive sampling actually pay?**

| strategy | idea |
|---|---|
| `uniform` | IID uniform over space × time |
| `stratified` | Latin-hypercube: one point per equal-width bin per dim |
| `residual_based` (RAR/RAD) | oversample where \\|residual\\| is large, from a 4× uniform pool |
| `adaptive` (DQN) | an RL agent places a region window; points are drawn inside it |

All four are pure PRNG functions of `(key, n, domain, time_domain)` — they
jit, vmap, and run on-device inside the training scan."""),
    code("""import jax, jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from pinnrl_tpu.sampling.strategies import (
    sample_uniform, sample_stratified, sample_residual_based,
)

DOMAIN, TDOM = [(-1.0, 1.0)], (0.0, 1.0)
N = 2000

# A synthetic sharp-front "residual" field: large along the moving front
# x = 0.6 t - 0.3 (the shape of the viscous Burgers front the measured
# studies train on).
def front_residual(x, t):
    return jnp.exp(-((x[:, 0] - (0.6 * t[:, 0] - 0.3)) / 0.08) ** 2)

key = jax.random.PRNGKey(0)
draws = {
    "uniform": sample_uniform(key, N, DOMAIN, TDOM),
    "stratified (LHS)": sample_stratified(key, N, DOMAIN, TDOM),
    "residual_based (RAR)": sample_residual_based(
        key, N, DOMAIN, TDOM, residual_fn=front_residual),
    "residual_based, no floor": sample_residual_based(
        key, N, DOMAIN, TDOM, residual_fn=front_residual, uniform_floor=0.0),
}
fig, axes = plt.subplots(1, 4, figsize=(16, 3.4), sharey=True)
for ax, (name, (x, t)) in zip(axes, draws.items()):
    ax.scatter(np.asarray(t), np.asarray(x), s=2, alpha=0.4)
    ax.plot([0, 1], [-0.3, 0.3], "r--", lw=1, label="front")
    ax.set_title(name, fontsize=10); ax.set_xlabel("t")
axes[0].set_ylabel("x"); axes[0].legend(loc="upper left", fontsize=8)
plt.tight_layout(); plt.show()"""),
    md("""The two RAR panels preview the *measured* headline: the shipped
default keeps a strong uniform floor (`uniform_floor=4.0`), so the batch
concentrates near the front **without abandoning the rest of the domain**.
The no-floor variant on the right looks more "adaptive" — and loses.

## The RAD hyper-parameters are measured, not folklore

The floor and exponent come from a 14-config × 6-seed sweep on the
Burgers-front harness (`benchmark_results/rar_sweep*.csv`; the notation is
k, c of Wu et al. 2023, CMAME):

- **without-replacement sampling** (Gumbel top-k) — with replacement,
  drawing n from a 4n pool wastes ~11–25% of a peaked batch on duplicates,
  which *alone* made RAR lose to uniform;
- **`uniform_floor=4`** ties uniform on the easy front (ν=0.01) and beats
  it ~1.3× on the sharp front (ν=0.004); every stronger-bias config
  (c≤1, k=2, or with-replacement) is worse in BOTH regimes, c=0 loses 3×."""),
    md("""## What 20 paired seeds say (`benchmark_results/sampling_r3.csv`)

Three regimes, 10k epochs, 4 strategies, 20 seeds each, same PRNG stream
per paired comparison. The honest summary is *regime dependence* — there
is no universally-best sampler."""),
    code("""import pandas as pd
from pathlib import Path

# Executable from the repo root (scripts/exec_notebooks.py) or notebooks/.
BR = Path("benchmark_results")
if not BR.exists():
    BR = Path("..") / "benchmark_results"

r3 = pd.read_csv(BR / "sampling_r3.csv")
piv = r3.pivot_table(index=["pde", "seed"], columns="strategy",
                     values="rel_l2")

summary = []
for pde, grp in piv.groupby(level="pde"):
    row = {"pde": pde}
    for s in ("uniform", "stratified", "residual_based", "adaptive"):
        row[s] = grp[s].median()
    # Paired ratio vs uniform: geometric mean over seeds + sign counts.
    for s in ("residual_based", "adaptive"):
        ratio = grp[s] / grp["uniform"]
        wins = int((ratio < 1).sum())
        row[f"{s} vs uniform"] = (
            f"x{np.exp(np.log(ratio).mean()):.2f} ({wins}/{len(ratio)} wins)"
        )
    summary.append(row)
pd.set_option("display.width", 160)
print(pd.DataFrame(summary).to_string(index=False,
      float_format=lambda v: f"{v:.2e}"))"""),
    code("""fig, axes = plt.subplots(1, 3, figsize=(14, 3.6))
for ax, pde in zip(axes, ["burgers", "burgers_sharp", "kdv"]):
    grp = piv.xs(pde, level="pde")
    data = [grp[s].dropna() for s in
            ("uniform", "stratified", "residual_based", "adaptive")]
    ax.boxplot(data, tick_labels=["unif", "LHS", "RAR", "DQN"])
    ax.set_yscale("log"); ax.set_title(f"{pde} (rel-L2, 20 seeds)")
plt.tight_layout(); plt.show()"""),
    md("""Reading of the measured table (matches
`benchmark_results/README.md`):

- **Easy regime (`burgers`, ν=0.01):** uniform is best (1.5e-3 median) and
  residual bias actively *hurts* — RAR is ×1.28 worse, winning only 4/20
  paired seeds. When the problem is well-resolved at the budget, skewing
  the batch just wastes coverage.
- **Sharp front (`burgers_sharp`, ν=0.004):** RAR wins — ×0.81 vs uniform
  (11/20 seeds), the under-resolved front is exactly the failure mode
  residual bias fixes. Note the win is a *geometric-mean* effect with
  real seed noise, not a uniform landslide.
- **Dispersive (`kdv`):** RAR's most consistent regime — ×0.79 with 15/20
  wins (radiation tails carry residual everywhere late in the horizon).
  DQN adaptive is mid-pack (×0.82 but only 11/20): its region window is a
  coarser instrument than per-point residual weighting.

## Can the DQN *learner* beat tuned RAR? (`sampling_r4.csv`)

Round 4 asked the sharpest version of the question: give the agent RAR's
own signal as a *feature* (state variant `resfeat`), or reward measured
improvement (`improve`), and run paired seeds against tuned RAR on KdV."""),
    code("""r4 = pd.read_csv(BR / "sampling_r4.csv")
piv4 = r4.pivot_table(index="seed", columns="strategy", values="rel_l2")
base = piv4["residual_based"]
rows = []
for s in [c for c in piv4.columns if c != "residual_based"]:
    ratio = (piv4[s] / base).dropna()
    rows.append({
        "strategy": s, "n_seeds": len(ratio),
        "geomean vs RAR": f"x{np.exp(np.log(ratio).mean()):.2f}",
        "wins": int((ratio < 1).sum()),
    })
print(pd.DataFrame(rows).to_string(index=False))"""),
    md("""Every learner variant sits at or above 1× tuned RAR (a ratio
above 1 means *worse*). The conclusion the repo ships: **the learning
machinery does not beat a well-tuned static residual bias in stationary
regimes** — even when the learner can see RAR's feature. If your problem
has a sharp, *moving* structure and a tight budget, reach for
`residual_based` with the measured defaults first; reach for `adaptive`
when the sampling distribution itself must react to non-stationary
training dynamics (the open regime the round-5 study probes with
time-marching window restarts).

The full paired CSVs are tracked in `benchmark_results/` and regenerate
with `scripts/run_sampling_suite.py`."""),
]


WORKSHOP_CELLS = [
    md("""# PINNs from zero: an introductory workshop

Counterpart of the reference's `PINN_intro_workshop.ipynb` crash-course
(same three tasks, re-authored on this framework's TPU-native API). The
running example is the pendulum ODE — 1-D in time, cheap enough for any
backend, and it exposes every concept that matters at scale:

1. **Task 1 — forward:** train a PINN to simulate the system.
2. **Task 2 — inverse:** recover the gravitational constant from noisy
   observations of the motion.
3. **Task 3 — frequency scaling:** watch the plain setup fail at higher
   frequency, then fix it with the Fourier-features ansatz.

Physics: θ'' + (g/L) θ = 0 (linearized), θ(0) = θ₀, θ'(0) = 0 — exact
solution θ₀ cos(ωt), ω = √(g/L)."""),
    code("""import jax, jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer

def pendulum_config(epochs=2000, scale=(0.0, 2.0), mapping=64,
                    hidden=(64, 64), g=9.81):
    cfg = load_config(pde_type="pendulum", architecture="fourier")
    cfg.model.hidden_dims = list(hidden)
    # Anisotropic Fourier basis: zero frequencies along the dummy spatial
    # axis make the net exactly x-independent, and the temporal scale must
    # cover the solution's ~5 oscillation periods (the measured recipe
    # lever — see the pendulum notes in pinnrl_tpu/benchmarks/convergence.py).
    cfg.model.arch_params.update({"mapping_size": mapping, "scale": scale})
    cfg.pde.parameters.update({"g": g, "L": 1.0, "linearized": True})
    # Exact-trace Dirichlet BCs on the dummy spatial edges (the default
    # periodic BC is a no-op constraint that lets edge drift leak in).
    cfg.pde.boundary_conditions = {"dirichlet": {"type": "exact"}}
    t = cfg.training
    t.num_epochs = epochs; t.batch_size = 1024
    t.num_collocation_points = 4096
    t.num_boundary_points = 256; t.num_initial_points = 256
    t.optimizer = "adam"; t.validation_frequency = max(epochs // 4, 1)
    t.early_stopping.enabled = False
    return cfg"""),
    md("""## Task 1: train a PINN to simulate the system

The trainer assembles residual + boundary + initial losses and runs a
jit-compiled `lax.scan` over epochs — one device program for the whole
training chunk."""),
    code("""cfg = pendulum_config()
pde = create_pde(cfg)
model = PINNModel(cfg, seed=0)
trainer = PDETrainer(model, pde, cfg)
res = trainer.train(seed=0)
params = trainer._final_state["params"]["net"]
val = pde.validate(model.apply, params, num_points=4000)
print(f"final train loss {res['final_train_loss']:.2e}  "
      f"rel-L2 vs exact {val['rel_l2']:.2e}")"""),
    code("""ts = np.linspace(*cfg.pde.time_domain, 400).reshape(-1, 1)
xs = np.zeros_like(ts)
z = jnp.concatenate([jnp.asarray(xs), jnp.asarray(ts)], axis=-1)
pred = np.asarray(model.apply(params, z)).reshape(-1)
exact = np.asarray(pde.exact_solution(jnp.asarray(xs), jnp.asarray(ts))).reshape(-1)
plt.figure(figsize=(8, 3))
plt.plot(ts, exact, label="exact θ₀cos(ωt)")
plt.plot(ts, pred, "--", label="PINN")
plt.xlabel("t"); plt.ylabel("θ"); plt.legend(); plt.tight_layout(); plt.show()"""),
    md("""## Task 2: invert for the gravitational constant

Physics stays in the loss; `g` becomes a *trainable* coefficient. We
generate noisy observations of the true motion, start the guess 2× off,
and let the same trainer identify it (mode `inverse` adds the data-misfit
term; the coefficient rides the same optimizer as the network)."""),
    code("""cfg_inv = pendulum_config(epochs=1500)
cfg_inv.training.mode = "inverse"
cfg_inv.pde.trainable_parameters = ["g"]
cfg_inv.pde.parameter_initial_guesses = {"g": 20.0}   # truth: 9.81
pde_inv = create_pde(cfg_inv)
pde_inv.generate_synthetic_observations(
    jax.random.PRNGKey(7), num_points=1000, noise=0.01)
model_inv = PINNModel(cfg_inv, seed=0)
trainer_inv = PDETrainer(model_inv, pde_inv, cfg_inv)
res_inv = trainer_inv.train(seed=0)
g_hat = float(res_inv["identified_parameters"]["g"])
print(f"identified g = {g_hat:.4f} (truth 9.81, started at 20.0, "
      f"rel err {abs(g_hat - 9.81) / 9.81:.2%})")"""),
    code("""hist = trainer_inv.history.get("param_g", [])
plt.figure(figsize=(8, 3))
plt.plot(hist, label="identified g")
plt.axhline(9.81, ls="--", c="r", label="true g")
plt.xlabel("epoch"); plt.ylabel("g"); plt.legend(); plt.tight_layout(); plt.show()"""),
    md("""## Task 3: higher-frequency oscillations and the ansatz fix

Quadruple `g` → double the frequency. A low-frequency input basis now
*under-resolves* the oscillation and training stalls — the spectral-bias
failure the reference workshop demonstrates with a hand-built `cos(ωt)`
ansatz. The TPU-native equivalent of that ansatz is the **Fourier-features
basis scale**: match the feature frequencies to the solution's."""),
    code("""results = {}
for name, scale in [("scale (0,1) — too low", (0.0, 1.0)),
                    ("scale (0,5) — matched", (0.0, 5.0))]:
    c = pendulum_config(scale=scale, g=4 * 9.81)
    p = create_pde(c); m = PINNModel(c, seed=0)
    tr = PDETrainer(m, p, c); r = tr.train(seed=0)
    v = p.validate(m.apply, tr._final_state["params"]["net"], num_points=4000)
    results[name] = v["rel_l2"]
    print(f"{name:26s} rel-L2 {v['rel_l2']:.2e}")"""),
    md("""The matched basis lands ~100× better at the same budget (executed
above: 1.5e-3 → 1.5e-5): with ω doubled, the fix is not a bigger network
but a basis whose frequencies cover the solution's. That is the general
lesson this repo's recipes encode — every shipped PDE recipe pins a
*measured* Fourier scale (`pinnrl_tpu/benchmarks/convergence.py`
documents the sweeps).

## Extensions

- **Nonlinear pendulum:** set `parameters.linearized = False` — the exact
  target becomes the Jacobi-elliptic solution (`pinnrl_tpu/ops/special.py`)
  and the `pendulum_nonlinear` benchmark recipe shows the tuned setup.
- **Causal weighting** (`training.causal_eps`): trains early times first —
  the lever for long-horizon dynamics (KdV, Cahn-Hilliard).
- **Hard initial conditions** (`model.hard_ic`): impose the IC by
  construction instead of by penalty.
- **Scale out:** wrap the same trainer in a `jax.sharding.Mesh`
  (`pinnrl_tpu/parallel/mesh.py`) — the loss and gradients shard over
  devices with no change to the model code."""),
]


def main() -> None:
    for name, cells in [
        ("sampling_techniques", SAMPLING_CELLS),
        ("pinn_intro_workshop", WORKSHOP_CELLS),
    ]:
        path = OUT / f"{name}.ipynb"
        path.write_text(json.dumps(notebook(cells), indent=1))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
