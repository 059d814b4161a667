#!/usr/bin/env python
"""Generate the Hosek-Wilkie sky-model coefficient tables.

Parses the published model data (Hosek & Wilkie, "An Analytic Model for
Full Spectral Sky-Dome Radiance", SIGGRAPH 2012 + the 2013 solar radiance
extension; 3-clause BSD, distributed with the reference at
/root/reference/src/ext/skymodel/ArHosekSkyModelData_Spectral.h) into
compact .npz tables for utils/sky.py. The coefficients are public
published data — the same provenance category as the Joe-Kuo Sobol
direction numbers (tools/gen_sobol_tables.py).

Layout (ArHosekSkyModel.c ArHosekSkyModelState_alloc_init):
  dataset{band}     : [albedo(2)][turbidity(10)][ctrlpt(6)][param(9)]
  datasetRad{band}  : [albedo(2)][turbidity(10)][ctrlpt(6)]
  solarDataset{band}: [turbidity(10)][pieces(45)][order(4)]
  limbDarkeningDataset{band}: [6]
Bands: 320..720 nm step 40 (11 bands).

Usage: python -m pbrt_tpu.tools.gen_sky_tables [header_path] [out.npz]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

BANDS = list(range(320, 721, 40))


def parse_header(path):
    text = open(path).read()
    # Strip // comments (they mention albedo/turbidity indices — numbers
    # the value regex would otherwise swallow).
    text = re.sub(r"//[^\n]*", "", text)
    arrays = {}
    for m in re.finditer(
        r"double\s+(\w+)\[\]\s*=\s*\{(.*?)\};", text, re.S
    ):
        name, body = m.group(1), m.group(2)
        vals = [
            float(v) for v in re.findall(
                r"[-+]?[\d.]+(?:[eE][-+]?\d+)?", body
            )
        ]
        arrays[name] = np.asarray(vals, np.float64)
    return arrays


def build_tables(arrays):
    sky = np.stack(
        [arrays[f"dataset{b}"].reshape(2, 10, 6, 9) for b in BANDS]
    )
    rad = np.stack(
        [arrays[f"datasetRad{b}"].reshape(2, 10, 6) for b in BANDS]
    )
    solar = np.stack(
        [arrays[f"solarDataset{b}"].reshape(10, 45, 4) for b in BANDS]
    )
    limb = np.stack(
        [arrays[f"limbDarkeningDataset{b}"] for b in BANDS]
    )
    return {
        "bands": np.asarray(BANDS, np.float64),
        "sky": sky.astype(np.float32),
        "rad": rad.astype(np.float32),
        "solar": solar.astype(np.float32),
        "limb": limb.astype(np.float32),
    }


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/src/ext/skymodel/ArHosekSkyModelData_Spectral.h"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "utils", "data", "hosek_spectral.npz",
    )
    arrays = parse_header(src)
    tables = build_tables(arrays)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **tables)
    print(f"wrote {out}: " + ", ".join(
        f"{k}{v.shape}" for k, v in tables.items()
    ))


if __name__ == "__main__":
    main()
