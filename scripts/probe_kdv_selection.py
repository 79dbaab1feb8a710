"""KdV restart-selection probe: can a physics-only metric pick the best
init out of a vmapped restart ensemble?

Motivation (wave-5/6 data): at the shipping recipe (Fourier scale 0.75,
annealed adam 1500) the pinned-basis init lottery spans rel-L2 7.4e-4 ..
1.5e-3 across trainable-init seeds — the north-star bar (1e-3) sits INSIDE
the lottery spread. If a metric computable without the exact solution
(dense fresh-point total loss = residual + BC + IC) ranks the members, the
honest shipping recipe becomes best-of-E restarts, which the fused
vmapped-ensemble trainer gives us nearly for free on one chip.

For each member this records the ORACLE rel-L2 next to the selection
score so the CSV shows whether selection works (Spearman + chosen-vs-best).

Usage: python scripts/probe_kdv_selection.py [E] [epochs] [seed ...]
Appends rows to benchmark_results/probe_kdv_selection.csv
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.benchmarks.convergence import build_recipe_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training.trainer import PDETrainer

OUT = Path("benchmark_results/probe_kdv_selection.csv")


def dense_scores(pde, apply_fn, params_member, n=20000, key=0):
    """Physics-only selection score: total training loss on a dense FRESH
    uniform batch (fixed key so every member sees the same points)."""
    k = jax.random.PRNGKey(key)
    x, t = pde.generate_collocation_points(k, n, "uniform")
    losses = pde.compute_loss(apply_fn, params_member, x, t, key=k)
    return {name: float(losses[name]) for name in ("total", "residual", "boundary", "initial")}


def run(E: int, epochs: int, seed: int):
    cfg = build_recipe_config("kdv", epochs=epochs)
    cfg.training.ensemble_size = E
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    trainer.train(seed=seed)
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]

    # Dense evaluation grid shared by all members (for centroid distances).
    kg = jax.random.PRNGKey(7)
    xg, tg = pde.generate_collocation_points(kg, 20000, "uniform")
    zg = jnp.concatenate([xg, tg], axis=-1)

    preds, rows = [], []
    for m in range(E):
        p = jax.tree_util.tree_map(lambda a: a[m], params)
        val = pde.validate(model.apply, p, num_points=20000)
        sc = dense_scores(pde, model.apply, p)
        preds.append(np.asarray(model.apply(p, zg)).reshape(-1))
        rows.append(dict(member=m, rel_l2=float(val["rel_l2"]), **sc))

    # Second oracle-free metric: distance to the ensemble-mean prediction.
    # If member errors were zero-mean, the centroid approximates the truth
    # and the closest member is the best one.
    P = np.stack(preds)
    centroid = P.mean(axis=0)
    for m, r in enumerate(rows):
        r["centroid_dist"] = float(np.sqrt(np.mean((P[m] - centroid) ** 2)))

    rel = np.array([r["rel_l2"] for r in rows])
    tot = np.array([r["total"] for r in rows])
    # Spearman rank correlation between the selection score and oracle error
    rr, rt = np.argsort(np.argsort(rel)), np.argsort(np.argsort(tot))
    spear = float(np.corrcoef(rr, rt)[0, 1])
    cen = np.array([r["centroid_dist"] for r in rows])
    chosen = int(np.argmin(tot))
    chosen_c = int(np.argmin(cen))
    best = int(np.argmin(rel))
    print(
        f"seed={seed} E={E} ep={epochs} wall={wall:.0f}s | "
        f"best rel_l2={rel[best]:.3e} (m{best}) | "
        f"by-loss rel_l2={rel[chosen]:.3e} (m{chosen}) | "
        f"by-centroid rel_l2={rel[chosen_c]:.3e} (m{chosen_c}) | spearman={spear:.2f}"
    )

    new = not OUT.exists()
    with OUT.open("a") as f:
        if new:
            f.write("seed,E,epochs,member,rel_l2,score_total,score_residual,score_boundary,score_initial,centroid_dist,chosen,chosen_centroid,is_best,wall_s\n")
        for r in rows:
            f.write(
                f"{seed},{E},{epochs},{r['member']},{r['rel_l2']:.6e},"
                f"{r['total']:.6e},{r['residual']:.6e},{r['boundary']:.6e},"
                f"{r['initial']:.6e},{r['centroid_dist']:.6e},"
                f"{int(r['member'] == chosen)},{int(r['member'] == chosen_c)},"
                f"{int(r['member'] == best)},{wall:.1f}\n"
            )


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    seeds = [int(s) for s in sys.argv[3:]] or [1]
    OUT.parent.mkdir(exist_ok=True)
    for s in seeds:
        run(E, epochs, s)


if __name__ == "__main__":
    main()
