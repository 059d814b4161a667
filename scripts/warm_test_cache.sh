#!/bin/bash
# Warm the per-file JAX compilation cache (see conftest.py) by running each
# test module in its own process; crashes stay isolated to one module.
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "=== $f"
  timeout 2400 python -m pytest "$f" -q -p no:cacheprovider || fail=1
done
exit $fail
