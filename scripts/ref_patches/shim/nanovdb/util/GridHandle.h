// Shim GridHandle (see NanoVDB.h shim).
#ifndef SHIM_NANOVDB_GRIDHANDLE_H
#define SHIM_NANOVDB_GRIDHANDLE_H

#include "../NanoVDB.h"

namespace nanovdb {

template <typename BufferT>
class GridHandle {
  public:
    GridHandle() = default;
    GridHandle(GridHandle &&) = default;
    GridHandle &operator=(GridHandle &&) = default;
    GridHandle(const GridHandle &) = delete;
    GridHandle &operator=(const GridHandle &) = delete;

    explicit operator bool() const { return false; }
    template <typename T>
    const FloatGrid *grid() const { return nullptr; }
    const GridMetaData *gridMetaData() const { return nullptr; }
};

}  // namespace nanovdb

#endif
