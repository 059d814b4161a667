// Shim: OpenEXR threading global used by pbrt.cpp (EXR I/O itself is stubbed
// out of image.cpp by the headless patcher; goldens are written as PFM).
#ifndef SHIM_IMF_THREADING_H
#define SHIM_IMF_THREADING_H

namespace Imf {
inline void setGlobalThreadCount(int) {}
}

#endif
