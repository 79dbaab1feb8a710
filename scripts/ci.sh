#!/usr/bin/env bash
# Runner-agnostic CI gate (invoked by .github/workflows/checks.yml and
# runnable directly by the build driver). Tiers:
#   lint  — byte-compile every source + import the package
#   fast  — the per-change test tier: everything not marked slow.
#           Budget <10 min: measured 10m11s WALL on this 1-CPU host under
#           concurrent TPU-study load (round 4, 2026-08-21), ~9 min quiet.
#   full  — the nightly tier: whole suite under the sys.monitoring coverage
#           collector, then enforce the >=80% gate
#           (reference: .github/workflows/checks.yml:10-38)
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-fast}"

case "$tier" in
  lint)
    python -m compileall -q pinnrl_tpu scripts tests
    python -c "import pinnrl_tpu"
    echo "lint OK"
    ;;
  fast)
    python -m pytest tests/ -q -m "not slow" -x
    ;;
  full)
    covdir="$(mktemp -d)"
    PINNRL_COV_DIR="$covdir" python -m pytest tests/ -q
    python scripts/coverage_gate.py "$covdir" --min 80
    ;;
  *)
    echo "usage: ci.sh {lint|fast|full}" >&2
    exit 2
    ;;
esac
