#!/usr/bin/env bash
# Full test tier, one pytest process per module.
#
# The whole-suite single-process run compiles many hundreds of distinct
# XLA:CPU programs and the compiler eventually segfaults inside
# backend_compile_and_load (observed round 5: crash site moves between
# merge-kernel tests with accumulated compile count; every module passes
# in isolation; jax.clear_caches() between modules does not prevent it).
# Per-module processes bound the compiler state and make the full tier
# deterministic.  The smoke tier (-m "not slow") stays single-process.
set -u
cd "$(dirname "$0")/.."
fail=0
declare -a failed
for f in tests/test_*.py; do
    echo "=== $f ==="
    if ! python -m pytest "$f" -q "$@"; then
        fail=1
        failed+=("$f")
    fi
done
if [ "$fail" -ne 0 ]; then
    echo "FAILED modules: ${failed[*]}"
else
    echo "ALL MODULES PASSED"
fi
exit "$fail"
