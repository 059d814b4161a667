#!/bin/bash
# Build the reference renderer (scienstanford/pbrt-v4) CPU-only in /tmp so
# tests/test_reference_parity.py can render golden images to compare against.
#
# The sandbox lacks libgsl, X11/OpenGL dev libraries, and the reference
# mount ships EMPTY vendored submodules (OpenEXR, zlib, ptex, lodepng, stb,
# qoi, double-conversion, utf8proc, libdeflate, filesystem, eigen, openvdb,
# glfw) plus two stripped table-data files (.MISSING_LARGE_BLOBS). This
# script copies the reference to /tmp/refpbrt and applies headless-build
# patches — all original shim code kept in scripts/ref_patches/ — that stub
# the missing libraries down to the API subset pbrt actually uses. Image
# output goes through the self-contained PFM path.
#
# Usage: scripts/build_reference.sh  →  /tmp/refpbrt/build/pbrt
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC=/root/reference
DST=/tmp/refpbrt

if [ -x "$DST/build/pbrt" ]; then
    echo "already built: $DST/build/pbrt"
    exit 0
fi

rm -rf "$DST/src"
mkdir -p "$DST/src"
(cd "$SRC" && tar cf - --exclude=.git .) | (cd "$DST/src" && tar xf -)
chmod -R u+w "$DST/src"
cd "$DST/src"

# 1. Stripped table data: zero-initialized definitions (the goldens don't use
#    the pmj02bn sampler or blue-noise-dependent paths).
cat > src/pbrt/util/bluenoise.cpp <<'EOF'
#include <pbrt/util/bluenoise.h>
namespace pbrt {
PBRT_CONST uint16_t
    BlueNoiseTextures[NumBlueNoiseTextures][BlueNoiseResolution][BlueNoiseResolution] = {};
}
EOF
cat > src/pbrt/util/pmj02tables.cpp <<'EOF'
#include <pbrt/util/pmj02tables.h>
namespace pbrt {
PBRT_CONST uint32_t pmj02bnSamples[nPMJ02bnSets][nPMJ02bnSamples][2] = {};
}
EOF

# 2. Shim tree for the missing vendored libraries + GSL.
cp -r "$REPO/scripts/ref_patches/shim" src/ext/shim
mkdir -p src/ext/lodepng
cp src/ext/shim/lodepng/lodepng.cpp src/ext/lodepng/lodepng.cpp
cp src/ext/shim/lodepng/lodepng.h src/ext/lodepng/lodepng.h
cp "$REPO/scripts/ref_patches/ext_CMakeLists.txt" src/ext/CMakeLists.txt

# 3. Headless GUI stub (no GLFW/OpenGL).
cp "$REPO/scripts/ref_patches/gui_stub.h" src/pbrt/util/gui.h
: > src/pbrt/util/gui.cpp

# 4. Source patches: EXR excision in image.cpp + root CMakeLists cleanup.
python3 "$REPO/scripts/ref_patches/patch_reference.py" "$DST/src"

mkdir -p "$DST/build"
cd "$DST/build"
cmake -G Ninja -DCMAKE_BUILD_TYPE=Release \
      -DPBRT_BUILD_GPU_RENDERER=OFF \
      "$DST/src" > cmake.log 2>&1 || { tail -40 cmake.log; exit 1; }
ninja pbrt_exe > ninja.log 2>&1 || { tail -60 ninja.log; exit 1; }
echo "built: $DST/build/pbrt"
