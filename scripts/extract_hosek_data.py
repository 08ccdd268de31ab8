"""Extract the published Hosek-Wilkie RGB sky-model dataset to .npz.

The coefficient tables in the reference's skymodeldata.h are the public
dataset released with "An Analytic Model for Full Spectral Sky-Dome
Radiance" (Hosek & Wilkie, SIGGRAPH 2012; ART project, BSD license) —
identical numbers ship with every implementation of the model. This
script parses the numeric arrays (data, not code) into
sdmm_tpu/data/hosek_rgb.npz for the standalone sunsky emitter
(sdmm_tpu/scene/sunsky.py).

Layout per channel: dataset [2 albedos, 10 turbidities, 6 elevation
control points, 9 coefficients]; radiance dataset [2, 10, 6].
"""

from __future__ import annotations

import os
import re

import numpy as np

SRC = "/root/reference/mitsuba/src/emitters/sunsky/skymodeldata.h"
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "sdmm_tpu", "data", "hosek_rgb.npz",
)


def parse_array(text: str, name: str) -> np.ndarray:
    m = re.search(
        rf"double\s+{name}\[\]\s*=\s*\{{(.*?)\}}\s*;", text, re.S
    )
    assert m, name
    body = re.sub(r"//[^\n]*", "", m.group(1))
    vals = [
        float(v) for v in re.findall(
            r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", body
        )
    ]
    return np.asarray(vals, dtype=np.float64)


def main():
    with open(SRC) as f:
        text = f.read()
    cfg = []
    rad = []
    for ch in (1, 2, 3):
        c = parse_array(text, f"datasetRGB{ch}")
        assert c.size == 2 * 10 * 6 * 9, c.size
        cfg.append(c.reshape(2, 10, 6, 9))
        r = parse_array(text, f"datasetRGBRad{ch}")
        assert r.size == 2 * 10 * 6, r.size
        rad.append(r.reshape(2, 10, 6))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        config=np.stack(cfg),  # [3, 2, 10, 6, 9]
        radiance=np.stack(rad),  # [3, 2, 10, 6]
    )
    print(f"wrote {OUT}: config {np.stack(cfg).shape}, "
          f"radiance {np.stack(rad).shape}")


if __name__ == "__main__":
    main()
