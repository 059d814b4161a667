// Shim for the Ptex API subset pbrt's textures.cpp uses. Every texture load
// fails cleanly (cache->get returns nullptr), so scenes referencing .ptx
// files render with ptex textures evaluating to 0. Original code.
#ifndef SHIM_PTEXTURE_H
#define SHIM_PTEXTURE_H

#include <cstdint>
#include <string>

class PtexErrorHandler {
  public:
    virtual ~PtexErrorHandler() {}
    virtual void reportError(const char *error) = 0;
};
class PtexInputHandler;

namespace Ptex {

using String = std::string;

class PtexTexture {
  public:
    struct Info {
        int numFaces = 0;
    };
    int numChannels() const { return 0; }
    Info getInfo() const { return Info(); }
    void release() {}
};

class PtexFilter {
  public:
    enum FilterType { f_point, f_bilinear, f_box, f_gaussian, f_bicubic, f_bspline,
                      f_catmullrom, f_mitchell };
    struct Options {
        Options(FilterType t) : type(t) {}
        FilterType type;
    };
    static PtexFilter *getFilter(PtexTexture *, const Options &) {
        static PtexFilter f;
        return &f;
    }
    void eval(float *result, int, int nc, int, float, float, float, float, float,
              float) {
        for (int i = 0; i < nc; ++i) result[i] = 0.f;
    }
    void release() {}
};

class PtexCache {
  public:
    struct Stats {
        uint64_t memUsed = 0, peakMemUsed = 0, filesOpen = 0, filesAccessed = 0,
                 fileReopens = 0, blockReads = 0;
    };
    static PtexCache *create(int, size_t, bool, PtexInputHandler * = nullptr,
                             PtexErrorHandler *handler = nullptr) {
        static PtexCache c;
        c.handler = handler;
        return &c;
    }
    PtexTexture *get(const char *filename, String &error) {
        error = std::string(filename) +
                ": Ptex support is not built in this sandbox reference build";
        return nullptr;
    }
    void getStats(Stats &stats) { stats = Stats(); }
    void setSearchPath(const char *) {}

  private:
    PtexErrorHandler *handler = nullptr;
};

}  // namespace Ptex

#endif
