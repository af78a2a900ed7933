#!/usr/bin/env bash
# CI test runner: one pytest process PER TEST MODULE.
#
# Why not one big `pytest tests/`: XLA's CPU client is not designed to
# compile the whole suite's hundreds of distinct programs in one process —
# with the 8-virtual-device mesh it reproducibly segfaults inside compilation
# (observed at tests/test_tp_eval.py when the suite runs single-process;
# every module passes in its own process). Per-module isolation also bounds
# compile-cache memory and makes one module's crash non-fatal to the rest.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
# Exits nonzero if ANY module fails; prints a per-module summary.

set -u
cd "$(dirname "$0")/.."

FAILED=()
PASSED=0
for f in tests/test_*.py; do
  echo "=== $f"
  if python -m pytest "$f" -q -p no:cacheprovider "$@"; then
    PASSED=$((PASSED + 1))
  else
    FAILED+=("$f")
  fi
done

echo
echo "=== run_tests.sh summary: $PASSED modules passed, ${#FAILED[@]} failed"
if [ "${#FAILED[@]}" -gt 0 ]; then
  printf '  FAILED: %s\n' "${FAILED[@]}"
  exit 1
fi
