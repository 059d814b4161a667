#!/usr/bin/env python3
"""Patch the /tmp copy of the reference for a headless sandbox build.

Applied by scripts/build_reference.sh after copying /root/reference to
/tmp/refpbrt/src. Edits:
  1. image.cpp — excise the OpenEXR read/write span (Imf API; the OpenEXR
     submodule is empty in this mount) and stub ReadEXR/WriteEXR. Goldens
     are written as PFM, which is self-contained in image.cpp.
  2. Root CMakeLists.txt — drop OpenGL/GSL find_packages, GL/GLFW/glad and
     missing-submodule link libraries, point GSL includes at the shim.
"""
import re
import sys

root = sys.argv[1]  # /tmp/refpbrt/src


def patch(path, fn):
    with open(path) as f:
        text = f.read()
    out = fn(text)
    with open(path, "w") as f:
        f.write(out)


EXR_STUBS = """\
// EXR I/O excised for the headless sandbox build (OpenEXR submodule is not
// present in this mount); goldens use the self-contained PFM path.
static ImageAndMetadata ReadEXR(const std::string &name, Allocator alloc) {
    ErrorExit("%s: EXR support is not built in this sandbox reference build; "
              "use PFM instead", name);
}

bool Image::WriteEXR(const std::string &name, const ImageMetadata &metadata) const {
    Error("%s: EXR support is not built in this sandbox reference build; "
          "use PFM instead", name);
    return false;
}

"""


def patch_image(text):
    # Drop Imf includes (ImfThreading shim covers pbrt.cpp; image.cpp needs none).
    text = re.sub(r"#include <Imf[^>]*>\n", "", text)
    start = text.index("static Imf::FrameBuffer imageToFrameBuffer")
    end = text.index("static ImageAndMetadata ReadPNG(const std::string &name, "
                     "Allocator alloc,", start)
    return text[:start] + EXR_STUBS + text[end:]


def patch_cmake(text):
    # The missing-submodule guard fires on the empty ext dirs the shims replace.
    text = re.sub(r'check_ext \("[^"]*" "[^"]*" [0-9a-f]+\)\n', "", text)
    text = text.replace("find_package(OpenGL REQUIRED)", "# headless: no OpenGL")
    text = text.replace(
        "find_package(GSL)",
        "set(GSL_INCLUDE_DIR ${CMAKE_CURRENT_SOURCE_DIR}/src/ext/shim)\n"
        "set(GSL_LIBRARIES \"\")",
    )
    # Strip dropped libraries from ALL_PBRT_LIBS.
    for lib in ["  Ptex_static\n", "  double-conversion\n", "  utf8proc\n",
                "  glfw\n", "  glad\n", "  OpenGL::GL"]:
        text = text.replace(lib, "")
    # Shim include dir must be on the pbrt_lib include path (for <Ptexture.h>,
    # <Eigen/Dense>, <gsl/...> style includes resolved from the shim root).
    text = text.replace(
        "target_include_directories (pbrt_lib PUBLIC\n  src\n  src/ext",
        "target_include_directories (pbrt_lib PUBLIC\n  src\n  src/ext\n"
        "  src/ext/shim",
    )
    return text


patch(f"{root}/src/pbrt/util/image.cpp", patch_image)
patch(f"{root}/CMakeLists.txt", patch_cmake)
print("patched image.cpp + CMakeLists.txt")
