"""Rebuild benchmark_results/convergence.csv (the judged artifact) from the
freshest per-(pde,seed) rows of convergence_r2.csv (the append-only suite log).

convergence.csv keeps the stable schema
    pde,architecture,epochs,rel_l2,max_error,wall_time_s,hardware
with hardware = "tpu-v5e-1chip-seed<N>". Rows for PDEs absent from the suite
log are left untouched.

Usage: python scripts/refresh_convergence_csv.py [pde ...]
       (default: refresh every pde that has suite-log rows)
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
LOG = ROOT / "benchmark_results" / "convergence_r2.csv"
OUT = ROOT / "benchmark_results" / "convergence.csv"


def main() -> int:
    only = set(sys.argv[1:])
    latest: dict[tuple[str, str], dict] = {}
    with LOG.open() as f:
        for row in csv.DictReader(f):
            if only and row["pde"] not in only:
                continue
            latest[(row["pde"], row["seed"])] = row  # last write wins

    kept: list[dict] = []
    if OUT.exists():
        with OUT.open() as f:
            for row in csv.DictReader(f):
                seed = row["hardware"].rsplit("seed", 1)[-1]
                if (row["pde"], seed) not in latest:
                    kept.append(row)  # keep (pde, seed) rows the log lacks

    for (pde, seed), r in sorted(latest.items()):
        kept.append(
            dict(
                pde=pde,
                architecture=r["architecture"],
                epochs=r["epochs"],
                rel_l2=f"{float(r['rel_l2']):.3e}",
                max_error=f"{float(r['max_error']):.3e}",
                wall_time_s=f"{float(r['wall_time_s']):.0f}",
                hardware=f"tpu-v5e-1chip-seed{seed}",
            )
        )

    with OUT.open("w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "pde", "architecture", "epochs", "rel_l2", "max_error",
                "wall_time_s", "hardware",
            ],
        )
        w.writeheader()
        w.writerows(kept)
    print(f"wrote {OUT} ({len(kept)} rows; refreshed {sorted({p for p, _ in latest})})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
