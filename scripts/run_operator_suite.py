"""Run the Well-pipeline FNO operator benchmark across seeds (one subprocess
per run, retried on TPU-worker crashes like run_convergence_suite.py).

Produces benchmark_results/operator_r2.csv — the measured artifact for
BASELINE.json headline config #5's "The Well dataset FNO operator run"
(offline via the synthetic loader-cache injection; the identical pipeline
serves real Well data when `the_well` is installed).

    python scripts/run_operator_suite.py --seeds 0,1,2
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_RUN_ONE = """
import json
from pinnrl_tpu.benchmarks.operator import run_operator_benchmark
r = run_operator_benchmark({dataset!r}, epochs={epochs}, n_traj={n_traj},
                           n_points={n_points}, seed={seed})
print("RESULT " + json.dumps(r.__dict__))
"""

_HEALTH = [sys.executable, str(ROOT / "scripts" / "tpu_wait_healthy.py")]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic_heat_2d")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--n-traj", type=int, default=1)
    ap.add_argument("--n-points", type=int, default=8192)
    ap.add_argument("--csv", default=str(ROOT / "benchmark_results" / "operator_r2.csv"))
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--retries", type=int, default=3)
    args = ap.parse_args()

    csv = Path(args.csv)
    if not csv.exists():
        csv.parent.mkdir(exist_ok=True)
        csv.write_text(
            "dataset,architecture,mode,epochs,train_points,test_rel_l2,"
            "test_max_error,final_train_loss,wall_time_s,seed\n"
        )

    failures = 0
    for seed in (int(s) for s in args.seeds.split(",")):
        print(f"=== {args.dataset} seed={seed} ===", flush=True)
        line = None
        for attempt in range(args.retries + 1):
            if attempt:
                print(f"--- retry {attempt} ---", flush=True)
                subprocess.run(_HEALTH, timeout=600)
            code = _RUN_ONE.format(
                dataset=args.dataset, epochs=args.epochs, n_traj=args.n_traj,
                n_points=args.n_points, seed=seed,
            )
            proc = subprocess.run(
                [sys.executable, "-c", code],
                cwd=ROOT, capture_output=True, text=True, timeout=args.timeout,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
                None,
            )
            if proc.returncode == 0 and line is not None:
                break
            print(f"FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}", flush=True)
        if line is None:
            failures += 1
            continue
        r = json.loads(line[len("RESULT "):])
        row = (
            f"{r['dataset']},{r['architecture']},{r['mode']},{r['epochs']},"
            f"{r['train_points']},{r['test_rel_l2']:.6e},{r['test_max_error']:.6e},"
            f"{r['final_train_loss']:.6e},{r['wall_time_s']:.1f},{r['seed']}\n"
        )
        with open(csv, "a") as f:
            f.write(row)
        print(row.strip(), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
