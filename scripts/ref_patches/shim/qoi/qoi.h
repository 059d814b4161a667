// Shim for the QOI API subset pbrt's image.cpp uses; encode/decode report
// failure (goldens use PFM). Original code.
#ifndef SHIM_QOI_H
#define SHIM_QOI_H

#include <cstddef>

#define QOI_SRGB 0
#define QOI_LINEAR 1

typedef struct {
    unsigned int width;
    unsigned int height;
    unsigned char channels;
    unsigned char colorspace;
} qoi_desc;

inline void *qoi_encode(const void *, const qoi_desc *, int *out_len) {
    if (out_len) *out_len = 0;
    return nullptr;  // QOI support not built in this sandbox
}

inline void *qoi_decode(const void *, int, qoi_desc *desc, int) {
    if (desc) { desc->width = desc->height = 0; desc->channels = 0; desc->colorspace = QOI_SRGB; }
    return nullptr;  // QOI support not built in this sandbox
}

#endif
