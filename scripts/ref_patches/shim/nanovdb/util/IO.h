// Shim io::readGrid — always throws; pbrt's readGrid wrapper converts this
// into ErrorExit("nanovdb: <file>: ...").
#ifndef SHIM_NANOVDB_IO_H
#define SHIM_NANOVDB_IO_H

#include <stdexcept>
#include <string>

#include "GridHandle.h"

namespace nanovdb {
namespace io {

template <typename BufferT>
GridHandle<BufferT> readGrid(const std::string &, const std::string &, int,
                             BufferT &) {
    throw std::runtime_error("NanoVDB support is not built in this sandbox");
}

}  // namespace io
}  // namespace nanovdb

#endif
