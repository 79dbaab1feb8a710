#!/bin/bash
# Run one probe_recipe invocation, gated on TPU health and retried on the
# flaky axon-backend UNAVAILABLE crash.
# Usage: probe_retry.sh <timeout_s> <pde> [key=value ...]
set -u
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=$1; shift
BEFORE=$(wc -l < benchmark_results/probe_matrix.csv 2>/dev/null || echo 0)
for attempt in 1 2 3; do
  python scripts/tpu_wait_healthy.py 21600 || { echo "TPU never recovered" >&2; exit 1; }
  timeout "$T" python scripts/probe_recipe.py "$@"
  AFTER=$(wc -l < benchmark_results/probe_matrix.csv 2>/dev/null || echo 0)
  if [ "$AFTER" -gt "$BEFORE" ]; then exit 0; fi
  echo "probe attempt $attempt produced no row; retrying: $*" >&2
  sleep 30
done
echo "probe FAILED after 3 attempts: $*" >&2
exit 1
