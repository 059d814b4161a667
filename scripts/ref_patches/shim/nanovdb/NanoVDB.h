// Shim for the NanoVDB API subset pbrt's media.h/media.cpp use. No .nvdb
// file can actually be loaded (io::readGrid throws, which pbrt converts to
// ErrorExit), so all grid accessors are inert stubs that exist only so the
// NanoVDBMedium code compiles. Original code, not NanoVDB source.
#ifndef SHIM_NANOVDB_H
#define SHIM_NANOVDB_H

#include <cstdint>

namespace nanovdb {

template <typename T>
struct Vec3 {
    T v[3];
    Vec3() : v{0, 0, 0} {}
    Vec3(T x, T y, T z) : v{x, y, z} {}
    T operator[](int i) const { return v[i]; }
    T &operator[](int i) { return v[i]; }
};
using Vec3R = Vec3<double>;

struct Coord {
    int c[3];
    int operator[](int i) const { return c[i]; }
};

template <typename VecT>
struct BBox {
    VecT lo, hi;
    const VecT &min() const { return lo; }
    const VecT &max() const { return hi; }
};

struct FloatTree {
    void extrema(float &mn, float &mx) const { mn = mx = 0.f; }
};

struct FloatGridAccessor {
    float getValue(Coord) const { return 0.f; }
};

struct FloatGrid {
    using TreeType = FloatTree;
    template <typename T>
    Vec3<T> worldToIndexF(const Vec3<T> &p) const { return p; }
    const TreeType &tree() const { return tree_; }
    BBox<Vec3R> worldBBox() const { return {}; }
    BBox<Coord> indexBBox() const { return {}; }
    FloatGridAccessor getAccessor() const { return {}; }
    TreeType tree_;
};

struct GridMetaData {
    bool isFogVolume() const { return false; }
    bool isUnknown() const { return true; }
    uint64_t activeVoxelCount() const { return 0; }
};

template <typename TreeT, int Order, bool UseCache>
struct SampleFromVoxels {
    SampleFromVoxels(const TreeT &) {}
    template <typename T>
    float operator()(const Vec3<T> &) const { return 0.f; }
};

}  // namespace nanovdb

#endif
