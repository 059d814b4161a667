#!/bin/bash
# Regenerate the reference golden images for tests/test_reference_parity.py.
# Builds the reference renderer first if needed (scripts/build_reference.sh).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
"$REPO/scripts/build_reference.sh"
cd "$REPO/tests/goldens"
for s in box spheres spot fog conductor dielectric texture imagetex envmap plymesh bdpt sppm mlt; do
    /tmp/refpbrt/build/pbrt --seed 1 --quiet "$s.pbrt"
done
echo "goldens regenerated in $REPO/tests/goldens"
