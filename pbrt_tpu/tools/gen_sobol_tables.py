#!/usr/bin/env python
"""Regenerate the checked-in Sobol' direction-number table.

The table holds the 32-bit generator matrices for the first 256 Sobol'
dimensions of the Joe & Kuo (2008) "new-joe-kuo-6" direction numbers
("Constructing Sobol sequences with better two-dimensional projections",
SIAM J. Sci. Comput. 30, 2635-2654; data published at
web.maths.unsw.edu.au/~fkuo/sobol/, MIT-licensed generator-matrix form by
Leonhard Gruenschloss). This is public scientific table data — the analogue
of the CIE tables — transcribed here from the generated form shipped in the
reference (/root/reference/src/pbrt/util/sobolmatrices.cpp); only the data
constants are taken, no code.

Output: pbrt_tpu/samplers/data/sobol_matrices.npy, a (256, 32) uint32 array
where entry [d, b] is the direction vector for bit b of dimension d
(v_{d,b}; sample = XOR of v_{d,b} over the set bits b of the index).
"""

from __future__ import annotations

import os
import re

import numpy as np

N_DIMS = 256
MATRIX_SIZE = 52  # per-dimension stride in the source table
N_BITS = 32  # we keep 32 (indices are uint32 here)

SRC = "/root/reference/src/pbrt/util/sobolmatrices.cpp"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "samplers", "data", "sobol_matrices.npy",
)


def main() -> None:
    with open(SRC) as f:
        text = f.read()
    start = text.index("SobolMatrices32[")
    body = text[text.index("{", start):]
    vals = re.findall(r"0x[0-9a-fA-F]+", body[: body.index("};")])
    need = N_DIMS * MATRIX_SIZE
    assert len(vals) >= need, len(vals)
    arr = np.array([int(v, 16) for v in vals[:need]], dtype=np.uint64)
    arr = arr.reshape(N_DIMS, MATRIX_SIZE)[:, :N_BITS].astype(np.uint32)
    # Sanity: dim 0 is the van der Corput identity (bit-reversal) matrix.
    assert arr[0, 0] == 0x80000000 and arr[0, 31] == 0x00000001
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.save(OUT, arr)
    print(f"wrote {OUT}: {arr.shape} uint32 ({arr.nbytes} bytes)")


if __name__ == "__main__":
    main()
