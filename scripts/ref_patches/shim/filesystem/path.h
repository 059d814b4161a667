// Shim for the wjakob/filesystem path API subset used by pbrt's file.cpp,
// implemented over std::filesystem. Original code.
#ifndef SHIM_FILESYSTEM_PATH_H
#define SHIM_FILESYSTEM_PATH_H

#include <filesystem>
#include <string>

namespace filesystem {

class path {
  public:
    path() = default;
    path(const std::string &s) : p_(s) {}

    bool is_directory() const {
        std::error_code ec;
        return std::filesystem::is_directory(p_, ec);
    }
    bool is_absolute() const { return p_.is_absolute(); }
    bool exists() const {
        std::error_code ec;
        return std::filesystem::exists(p_, ec);
    }
    bool empty() const { return p_.empty(); }

    path parent_path() const { return path(p_.parent_path().string()); }
    // wjakob/filesystem returns the extension WITHOUT the leading dot.
    std::string extension() const {
        std::string e = p_.extension().string();
        if (!e.empty() && e[0] == '.') e.erase(0, 1);
        return e;
    }
    std::string filename() const { return p_.filename().string(); }
    path make_absolute() const {
        std::error_code ec;
        auto abs = std::filesystem::absolute(p_, ec);
        return path((ec ? p_ : abs).string());
    }
    std::string str() const { return p_.string(); }

    path operator/(const path &other) const { return path((p_ / other.p_).string()); }

  private:
    std::filesystem::path p_;
};

}  // namespace filesystem

#endif
