// Shim for the double-conversion API subset used by pbrt's print.cpp:
// shortest round-trip float/double formatting. Original implementation
// (snprintf precision search), not double-conversion source.
#ifndef SHIM_DOUBLE_CONVERSION_H
#define SHIM_DOUBLE_CONVERSION_H

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace double_conversion {

class StringBuilder {
  public:
    StringBuilder(char *buf, int size) : buf_(buf), size_(size), pos_(0) {}
    void Append(const char *s) {
        int n = (int)strlen(s);
        if (pos_ + n >= size_) n = size_ - 1 - pos_;
        memcpy(buf_ + pos_, s, n);
        pos_ += n;
        buf_[pos_] = '\0';
    }
    int position() const { return pos_; }

  private:
    char *buf_;
    int size_, pos_;
};

class DoubleToStringConverter {
  public:
    enum Flags { NO_FLAGS = 0 };
    DoubleToStringConverter(int flags, const char *inf, const char *nan,
                            char exp_char, int, int, int, int)
        : inf_(inf), nan_(nan) {}

    bool ToShortestSingle(float v, StringBuilder *result) const {
        if (std::isnan(v)) { result->Append(nan_); return true; }
        if (std::isinf(v)) { result->Append(v < 0 ? "-" : ""); result->Append(inf_); return true; }
        char buf[64];
        for (int prec = 1; prec <= 9; ++prec) {
            snprintf(buf, sizeof(buf), "%.*g", prec, (double)v);
            if (strtof(buf, nullptr) == v) break;
        }
        result->Append(buf);
        return true;
    }

    bool ToShortest(double v, StringBuilder *result) const {
        if (std::isnan(v)) { result->Append(nan_); return true; }
        if (std::isinf(v)) { result->Append(v < 0 ? "-" : ""); result->Append(inf_); return true; }
        char buf[64];
        for (int prec = 1; prec <= 17; ++prec) {
            snprintf(buf, sizeof(buf), "%.*g", prec, v);
            if (strtod(buf, nullptr) == v) break;
        }
        result->Append(buf);
        return true;
    }

  private:
    const char *inf_, *nan_;
};

class StringToDoubleConverter {
  public:
    enum Flags { NO_FLAGS = 0, ALLOW_HEX = 1 };
    StringToDoubleConverter(int flags, double empty_value, double junk_value,
                            const char *, const char *)
        : empty_(empty_value), junk_(junk_value) {}

    float StringToFloat(const char *buf, int len, int *processed) const {
        return (float)parse(buf, len, processed);
    }
    double StringToDouble(const char *buf, int len, int *processed) const {
        return parse(buf, len, processed);
    }

  private:
    double parse(const char *buf, int len, int *processed) const {
        // strtod needs NUL-termination; tokens are short, copy locally.
        char tmp[128];
        if (len >= (int)sizeof(tmp)) len = sizeof(tmp) - 1;
        memcpy(tmp, buf, len);
        tmp[len] = '\0';
        char *end = nullptr;
        double v = strtod(tmp, &end);
        *processed = int(end - tmp);
        if (*processed == 0) return len == 0 ? empty_ : junk_;
        return v;
    }
    double empty_, junk_;
};

}  // namespace double_conversion

#endif
