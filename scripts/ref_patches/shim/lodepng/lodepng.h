// Shim for the lodepng API subset pbrt's image.cpp uses; PNG encode/decode
// report failure (goldens use PFM). Original code.
#ifndef SHIM_LODEPNG_H
#define SHIM_LODEPNG_H

#include <cstddef>
#include <vector>

typedef enum LodePNGColorType {
    LCT_GREY = 0,
    LCT_RGB = 2,
    LCT_PALETTE = 3,
    LCT_GREY_ALPHA = 4,
    LCT_RGBA = 6
} LodePNGColorType;

struct LodePNGColorMode {
    LodePNGColorType colortype = LCT_RGBA;
    unsigned bitdepth = 8;
};
struct LodePNGInfo {
    LodePNGColorMode color;
};
struct LodePNGState {
    LodePNGInfo info_png;
};

void lodepng_state_init(LodePNGState *state);
unsigned lodepng_inspect(unsigned *w, unsigned *h, LodePNGState *state,
                         const unsigned char *in, size_t insize);
const char *lodepng_error_text(unsigned code);
unsigned lodepng_encode_memory(unsigned char **out, size_t *outsize,
                               const unsigned char *image, unsigned w, unsigned h,
                               LodePNGColorType colortype, unsigned bitdepth);

namespace lodepng {
unsigned decode(std::vector<unsigned char> &out, unsigned &w, unsigned &h,
                const unsigned char *in, size_t insize, LodePNGColorType colortype,
                unsigned bitdepth);
}

#endif
