"""Native (C++) runtime components, compiled on demand.

The reference keeps its parsing/IO layer in C++ (parser.h Tokenizer); this
package mirrors that: small C++ translation units compiled once per machine
with the system toolchain into a cached shared object, bound via ctypes.
Every entry point has a pure-Python fallback, so a missing compiler only
costs speed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


_SOURCES = ("tokenizer.cpp", "accel_build.cpp")


def _build_lib():
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    h = hashlib.sha256()
    for src in srcs:
        with open(src, "rb") as f:
            h.update(f.read())
    tag = h.hexdigest()[:16]
    cache = os.path.join(
        tempfile.gettempdir(), f"pbrt_tpu_native_{tag}.so"
    )
    if not os.path.exists(cache):
        tmp = cache + f".{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp] + srcs,
            check=True, capture_output=True,
        )
        os.replace(tmp, cache)
    lib = ctypes.CDLL(cache)
    lib.tokenize.restype = ctypes.c_longlong
    lib.tokenize.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong,
    ]
    lib.morton_order.restype = None
    lib.morton_order.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def get_lib():
    """The compiled native library, or None if no toolchain is available."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_lib()
        except Exception:
            _LIB = None
    return _LIB


def tokenize_native(text: str):
    """Tokenize .pbrt source with the C++ pass.

    Returns a list of tokens compatible with io.parser.tokenize: quoted
    strings keep their quotes, brackets are single characters, numbers are
    returned as their (python-float-equal) source substrings. Returns None
    when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode("utf-8", errors="surrogateescape")
    n = len(raw)
    cap = max(256, n // 2 + 16)
    starts = np.empty(cap, np.int32)
    ends = np.empty(cap, np.int32)
    kinds = np.empty(cap, np.int8)
    values = np.empty(cap, np.float64)

    def call(cap_now):
        return lib.tokenize(
            raw, n,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap_now,
        )

    count = call(cap)
    if count < 0:
        cap = -count
        starts = np.empty(cap, np.int32)
        ends = np.empty(cap, np.int32)
        kinds = np.empty(cap, np.int8)
        values = np.empty(cap, np.float64)
        count = call(cap)
    toks = []
    for i in range(count):
        toks.append(raw[starts[i]:ends[i]].decode(
            "utf-8", errors="surrogateescape"
        ))
    return toks


def morton_order_native(centroids):
    """Stable ascending-Morton permutation of (n, 3) float32 centroids.

    C++ front half of the HLBVH build (aggregates.cpp:389-505 analogue);
    bit-identical to the numpy path in accel/bvh.py (_morton3 +
    argsort(kind="stable")). Returns an (n,) int64 array, or None when the
    native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    cent = np.ascontiguousarray(centroids, np.float32)
    n = cent.shape[0]
    order = np.empty(n, np.int64)
    if n:
        lib.morton_order(
            cent.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    return order
