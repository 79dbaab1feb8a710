"""Merge covtool dumps and enforce the coverage gate.

Usage: python scripts/coverage_gate.py <cov_dir> [--min 80]

Mirrors the reference CI's fail-under gate
(reference: .github/workflows/checks.yml:10-38, pyproject.toml:146-156 —
>=80%, with dashboard/main/train exempted). Prints a per-file table plus the
total, writes <cov_dir>/coverage.json, exits 1 if below the threshold.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import covtool


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cov_dir")
    ap.add_argument("--min", type=float, default=80.0)
    args = ap.parse_args()

    rep = covtool.report(args.cov_dir)
    width = max((len(f) for f in rep["files"]), default=10)
    for f, row in sorted(rep["files"].items(), key=lambda kv: kv[1]["pct"]):
        print(f"{f:<{width}}  {row['covered']:>5}/{row['total']:<5}  {row['pct']:>5.1f}%")
    print("-" * (width + 22))
    print(
        f"{'TOTAL':<{width}}  {rep['covered']:>5}/{rep['executable']:<5}  "
        f"{rep['total_pct']:>5.1f}%"
    )
    Path(args.cov_dir, "coverage.json").write_text(json.dumps(rep, indent=2))
    if rep["total_pct"] < args.min:
        print(f"FAIL: coverage {rep['total_pct']}% < {args.min}%", file=sys.stderr)
        return 1
    print(f"OK: coverage {rep['total_pct']}% >= {args.min}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
