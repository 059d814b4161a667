// Shim for the stb_image API subset pbrt uses (JPG/TGA/BMP/HDR reading);
// loads report failure. Original code.
#ifndef SHIM_STB_IMAGE_H
#define SHIM_STB_IMAGE_H

#include <cstdlib>

typedef unsigned char stbi_uc;

inline unsigned char *stbi_load(const char *, int *x, int *y, int *comp, int) {
    if (x) *x = 0;
    if (y) *y = 0;
    if (comp) *comp = 0;
    return nullptr;
}
inline float *stbi_loadf(const char *, int *x, int *y, int *comp, int) {
    if (x) *x = 0;
    if (y) *y = 0;
    if (comp) *comp = 0;
    return nullptr;
}
inline void stbi_image_free(void *p) { free(p); }
inline const char *stbi_failure_reason() {
    return "stb_image support not built in this sandbox";
}

#endif
