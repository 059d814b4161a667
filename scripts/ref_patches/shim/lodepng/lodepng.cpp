// Stub implementation backing the lodepng shim header (the root CMakeLists
// compiles src/ext/lodepng/lodepng.cpp into pbrt_lib).
#include "lodepng.h"

void lodepng_state_init(LodePNGState *state) {
    *state = LodePNGState();
}

unsigned lodepng_inspect(unsigned *w, unsigned *h, LodePNGState *, const unsigned char *,
                         size_t) {
    *w = *h = 0;
    return 1;  // error: PNG support not built
}

const char *lodepng_error_text(unsigned) {
    return "PNG support not built in this sandbox";
}

unsigned lodepng_encode_memory(unsigned char **out, size_t *outsize,
                               const unsigned char *, unsigned, unsigned,
                               LodePNGColorType, unsigned) {
    *out = nullptr;
    *outsize = 0;
    return 1;
}

namespace lodepng {
unsigned decode(std::vector<unsigned char> &out, unsigned &w, unsigned &h,
                const unsigned char *, size_t, LodePNGColorType, unsigned) {
    out.clear();
    w = h = 0;
    return 1;
}
}  // namespace lodepng
