"""Multi-seed sampling-strategy comparison on a front-dominated problem.

VERDICT round-1 item 4: produce an artifact where adaptive (DQN) / RAR
sampling beats uniform at equal epochs. The Burgers traveling wave
(nu=0.01 -> front width 0.08, moving across the domain) is the regime
adaptive sampling exists for; the harness config must actually converge
(round-1's 300-epoch run learned nothing, rel-L2 ~ 1.0 for every strategy).

    python scripts/run_sampling_suite.py --pde burgers --seeds 0,1,2 \
        --epochs 2500 --batch 2048

Appends rows to benchmark_results/sampling_r2.csv; one subprocess per seed
so a TPU-worker crash only kills one run.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_RUN_ONE = """
import json
from pinnrl_tpu.benchmarks.sampling import run_sampling_benchmark
label = {pde!r}
pde_key = {pde_key!r}
nu = {nu!r}
if nu is not None:
    from pinnrl_tpu.benchmarks.convergence import RECIPES
    RECIPES[pde_key]["pde"]["parameters"]["nu"] = nu
rs = run_sampling_benchmark(pde=pde_key, epochs={epochs}, batch={batch},
                            lr={lr}, seed={seed}, arch={arch!r},
                            strategies={strategies!r}, rar={rar!r},
                            windows={windows})
for r in rs:
    r.pde = label
    print("RESULT " + json.dumps(r.__dict__))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pde", default="burgers")
    ap.add_argument("--arch", default="fourier")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--csv", default=str(ROOT / "benchmark_results" / "sampling_r2.csv"))
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--strategies", default="",
                    help="comma list; empty = all four")
    ap.add_argument("--nu", type=float, default=None,
                    help="override Burgers viscosity; rows are labeled "
                         "<pde>_sharp when set")
    ap.add_argument("--rar", default="",
                    help="RAD overrides as k=v comma list, e.g. "
                         "'uniform_floor=4,replace=0'")
    ap.add_argument("--windows", type=int, default=0,
                    help="expanding-horizon curriculum phases (rows are "
                         "labeled <pde>_tm<W>; the non-stationary regime)")
    args = ap.parse_args()

    strategies = args.strategies.split(",") if args.strategies else None
    rar = None
    if args.rar:
        rar = {}
        for kv in args.rar.split(","):
            k, v = kv.split("=")
            rar[k] = (v.lower() in ("1", "true")) if k == "replace" else float(v)
            if k == "pool_factor":
                rar[k] = int(float(v))

    csv = Path(args.csv)
    if not csv.exists():
        csv.parent.mkdir(exist_ok=True)
        csv.write_text(
            "pde,architecture,strategy,final_loss,l2_error,rel_l2,"
            "wall_time_s,points_per_sec,epochs,seed\n"
        )

    failures = 0
    for seed in (int(s) for s in args.seeds.split(",")):
        label = args.pde + ("_sharp" if args.nu is not None else "")
        if args.windows:
            label += f"_tm{args.windows}"
        code = _RUN_ONE.format(
            pde=label, pde_key=args.pde, nu=args.nu,
            epochs=args.epochs, batch=args.batch,
            lr=args.lr, seed=seed, arch=args.arch,
            strategies=strategies, rar=rar, windows=args.windows,
        )
        print(f"=== {args.pde} seed={seed} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=ROOT, capture_output=True, text=True, timeout=args.timeout,
        )
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")]
        if proc.returncode != 0 or not lines:
            failures += 1
            print(f"FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}", flush=True)
            continue
        import json

        for line in lines:
            r = json.loads(line[len("RESULT "):])
            row = (
                f"{r['pde']},{r['architecture']},{r['strategy']},"
                f"{r['final_loss']:.6e},{r['l2_error']:.6e},{r['rel_l2']:.6e},"
                f"{r['wall_time_s']:.3f},{r['points_per_sec']:.1f},"
                f"{r['epochs']},{r['seed']}\n"
            )
            with open(csv, "a") as f:
                f.write(row)
            print(row.strip(), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
