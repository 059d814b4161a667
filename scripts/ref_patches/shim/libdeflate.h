// Shim for the libdeflate API subset pbrt's file.cpp uses (.gz scene files).
// Decompression reports BAD_DATA (no gzip scenes in the golden suite).
#ifndef SHIM_LIBDEFLATE_H
#define SHIM_LIBDEFLATE_H

#include <cstddef>

struct libdeflate_decompressor {
    int unused;
};

enum libdeflate_result {
    LIBDEFLATE_SUCCESS = 0,
    LIBDEFLATE_BAD_DATA = 1,
    LIBDEFLATE_SHORT_OUTPUT = 2,
    LIBDEFLATE_INSUFFICIENT_SPACE = 3,
};

inline libdeflate_decompressor *libdeflate_alloc_decompressor() {
    static libdeflate_decompressor d;
    return &d;
}
inline void libdeflate_free_decompressor(libdeflate_decompressor *) {}

inline libdeflate_result libdeflate_gzip_decompress(libdeflate_decompressor *,
                                                    const void *, size_t, void *,
                                                    size_t, size_t *) {
    return LIBDEFLATE_BAD_DATA;  // gzip support not built in this sandbox
}

#endif
