// Shim for the utf8proc subset pbrt's string.cpp uses (NFC normalization).
// Pass-through copy: scene files in this sandbox are ASCII. Original code.
#ifndef SHIM_UTF8PROC_H
#define SHIM_UTF8PROC_H

#include <cstdlib>
#include <cstring>
#include <sys/types.h>

typedef int utf8proc_option_t;
typedef unsigned char utf8proc_uint8_t;
typedef ssize_t utf8proc_ssize_t;

#define UTF8PROC_COMPOSE 1

inline utf8proc_ssize_t utf8proc_map(const unsigned char *str, utf8proc_ssize_t len,
                                     utf8proc_uint8_t **dst, utf8proc_option_t) {
    *dst = (utf8proc_uint8_t *)malloc(len + 1);
    memcpy(*dst, str, len);
    (*dst)[len] = 0;
    return len;
}

inline const char *utf8proc_errmsg(utf8proc_ssize_t) { return "utf8proc shim error"; }

#endif
