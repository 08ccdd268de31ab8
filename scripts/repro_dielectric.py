#!/usr/bin/env python
"""Repro for the fused-engine dielectric Mosaic compile error
(render/wavefront.py fused_supported docstring; VERDICT r4 #5)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import numpy as np

    from test_render import make_box_scene

    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu.render.wavefront import fused_supported, render_wavefront
    from sdmm_tpu.scene.scene import BSDF_DIELECTRIC

    b = make_box_scene(64, 64)
    g = b.add_bsdf(BSDF_DIELECTRIC, specular=[1.0, 1.0, 1.0],
                   albedo=[1.0, 1.0, 1.0], eta=1.5)
    b.add_shape(shp.make_sphere([0.0, 0.45, 0.1], 0.3,
                                n_theta=24, n_phi=48), g)
    scene, cfg = b.build()
    cfg.width = cfg.height = 64
    cfg.max_depth = 10
    print("fused_supported:", fused_supported(scene, cfg, nee=True),
          "types:", cfg.bsdf_types, flush=True)
    out = render_wavefront(scene, cfg, spp=8, seed=0, nee=True)
    img = np.asarray(out["image"])
    print("mean:", img.mean(), "finite:", np.isfinite(img).all(), flush=True)


if __name__ == "__main__":
    main()
