#!/bin/bash
# Run one probe_recipe invocation, retrying on the flaky axon-backend
# UNAVAILABLE startup crash (the TPU worker recovers on the next process).
# Usage: probe_retry.sh <timeout_s> <pde> [key=value ...]
set -u
T=$1; shift
BEFORE=$(wc -l < benchmark_results/probe_matrix.csv 2>/dev/null || echo 0)
for attempt in 1 2 3; do
  timeout "$T" python scripts/probe_recipe.py "$@"
  AFTER=$(wc -l < benchmark_results/probe_matrix.csv 2>/dev/null || echo 0)
  if [ "$AFTER" -gt "$BEFORE" ]; then exit 0; fi
  echo "probe attempt $attempt produced no row; retrying in 30s: $*" >&2
  sleep 30
done
echo "probe FAILED after 3 attempts: $*" >&2
exit 1
