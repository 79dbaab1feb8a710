"""Run the convergence recipes across seeds, one subprocess per run.

Each run gets a fresh process because the KdV recipe enables jax x64 at its
L-BFGS phase switch (a process-global flag that must not leak into the f32
recipes), and because a crashed TPU worker then only kills one run.

Crash riding: each run trains with an experiment dir so the trainer writes
periodic mid-run checkpoints; when the subprocess dies (the degraded axon
backend kernel-faults long runs with an MTBF of ~10 min), the run is retried
in a fresh process resuming from the last checkpoint instead of from epoch 0.
Appends rows to benchmark_results/convergence_r2.csv.

    python scripts/run_convergence_suite.py --pdes burgers,kdv --seeds 0,1,2
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_RUN_ONE = """
import json
from pinnrl_tpu.benchmarks.convergence import run_convergence
r = run_convergence({pde!r}, seed={seed}, epochs={epochs},
                    experiment_dir={exp!r}, resume_from={resume!r})
print("RESULT " + json.dumps(r.__dict__))
"""

_HEALTH = [sys.executable, str(ROOT / "scripts" / "tpu_wait_healthy.py")]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdes", default="burgers,kdv")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--csv", default=str(ROOT / "benchmark_results" / "convergence_r2.csv"))
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--retries", type=int, default=3,
                    help="Extra attempts per run, resuming from the last checkpoint")
    args = ap.parse_args()

    csv = Path(args.csv)
    if not csv.exists():
        csv.parent.mkdir(exist_ok=True)
        csv.write_text(
            "pde,architecture,epochs,rel_l2,max_error,final_train_loss,"
            "wall_time_s,points_per_sec,seed\n"
        )

    failures = 0
    for pde in args.pdes.split(","):
        for seed in (int(s) for s in args.seeds.split(",")):
            print(f"=== {pde} seed={seed} ===", flush=True)
            exp = tempfile.mkdtemp(prefix=f"conv_{pde}_s{seed}_")
            line = None
            for attempt in range(args.retries + 1):
                ckpt = Path(exp) / "checkpoint.msgpack"
                resume = str(ckpt) if (attempt and ckpt.exists()) else None
                if attempt:
                    print(f"--- retry {attempt} (resume={'yes' if resume else 'no'}) ---",
                          flush=True)
                    subprocess.run(_HEALTH, timeout=600)
                code = _RUN_ONE.format(
                    pde=pde, seed=seed, epochs=args.epochs, exp=exp, resume=resume
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
            shutil.rmtree(exp, ignore_errors=True)
            if line is None:
                failures += 1
                continue
            r = json.loads(line[len("RESULT "):])
            row = (
                f"{r['pde']},{r['architecture']},{r['epochs']},{r['rel_l2']:.6e},"
                f"{r['max_error']:.6e},{r['final_train_loss']:.6e},"
                f"{r['wall_time_s']:.1f},{r['points_per_sec']:.0f},{r['seed']}\n"
            )
            with open(csv, "a") as f:
                f.write(row)
            print(row.strip(), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
