"""Paired statistics for the sampling-strategy study (VERDICT round-2 item 1b).

Reads a sampling CSV (pde,architecture,strategy,...,rel_l2,...,seed rows),
pairs strategies per (pde, seed), and reports per-PDE:
  - geometric-mean rel-L2 per strategy with a bootstrap 95% CI,
  - worst-seed rel-L2 (tail behaviour),
  - paired log-ratio vs uniform with bootstrap CI and sign counts — the
    paired design removes the dominant per-seed difficulty variance that
    made the 6-seed round-2 comparison inconclusive.

    python scripts/sampling_stats.py benchmark_results/sampling_r3.csv
    python scripts/sampling_stats.py benchmark_results/sampling_r4.csv \
        --baseline residual_based     # round-4 DQN-variant studies
"""

from __future__ import annotations

import csv
import math
import random
import sys
from collections import defaultdict


def geomean(xs):
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def bootstrap_ci(xs, stat, n_boot=20000, alpha=0.05, seed=7):
    rng = random.Random(seed)
    vals = sorted(
        stat([xs[rng.randrange(len(xs))] for _ in xs]) for _ in range(n_boot)
    )
    lo = vals[int(alpha / 2 * n_boot)]
    hi = vals[int((1 - alpha / 2) * n_boot) - 1]
    return lo, hi


def analyze(path: str, baseline: str = "uniform") -> str:
    rows = list(csv.DictReader(open(path)))
    out = []
    by_pde = defaultdict(list)
    for r in rows:
        by_pde[r["pde"]].append(r)
    for pde, prs in sorted(by_pde.items()):
        cell = {}
        for r in prs:
            cell[(r["strategy"], int(r["seed"]))] = float(r["rel_l2"])
        strategies = sorted({s for s, _ in cell})
        seeds = sorted({sd for _, sd in cell})
        complete = [
            sd for sd in seeds if all((s, sd) in cell for s in strategies)
        ]
        out.append(f"\n== {pde} ({len(complete)} complete seeds) ==")
        out.append(
            f"{'strategy':<16} {'geomean':>10} {'95% CI':>23} {'worst':>10}"
        )
        for s in strategies:
            xs = [cell[(s, sd)] for sd in complete]
            gm = geomean(xs)
            lo, hi = bootstrap_ci(xs, geomean)
            out.append(
                f"{s:<16} {gm:10.3e} [{lo:9.3e},{hi:9.3e}] {max(xs):10.3e}"
            )
        if baseline in strategies:
            out.append(f"\n{'paired vs ' + baseline:<16}  ratio of geomeans [95% CI]  wins/losses")
            for s in strategies:
                if s == baseline:
                    continue
                logr = [
                    math.log(cell[(s, sd)] / cell[(baseline, sd)])
                    for sd in complete
                ]
                ratio = math.exp(sum(logr) / len(logr))
                lo, hi = bootstrap_ci(
                    logr, lambda v: math.exp(sum(v) / len(v))
                )
                wins = sum(1 for v in logr if v < 0)
                out.append(
                    f"{s:<16} {ratio:6.3f} [{lo:6.3f},{hi:6.3f}]  "
                    f"{wins}/{len(logr) - wins}"
                    + ("   (CI excludes 1 -> significant)" if hi < 1.0 or lo > 1.0 else "")
                )
    return "\n".join(out)


if __name__ == "__main__":
    args = sys.argv[1:]
    baseline = "uniform"
    if "--baseline" in args:
        i = args.index("--baseline")
        baseline = args[i + 1]
        del args[i : i + 2]
    print(analyze(args[0], baseline=baseline))
