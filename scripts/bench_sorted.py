"""Bench the pilot+cost-sorted megakernel pool on the reference cornell box.

Usage: python scripts/bench_sorted.py [spp_pilot ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sdmm_tpu.utils.cache import enable as enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402

from sdmm_tpu.render.wavefront import render_pool_fused_sorted  # noqa: E402
from sdmm_tpu.scene.xml_loader import load_scene  # noqa: E402


def time_run(fn, label):
    for w in range(2):
        float(fn(w)["n_vertices"])
    rates = []
    for i in range(2, 7):
        t0 = time.perf_counter()
        out = fn(i)
        nv = float(out["n_vertices"])
        steps = float(out["steps"])
        dt = time.perf_counter() - t0
        rates.append(nv / dt)
    rates.sort()
    med = rates[len(rates) // 2]
    extra = ""
    if "alive_tile_steps" in out:
        af = float(out["alive_tile_steps"]) / max(
            float(out["total_tile_steps"]), 1.0)
        extra = f", alive-tile frac {af:.3f}"
    print(f"{label}: {med/1e6:.1f} Mrays/s (steps {steps:.0f}, "
          f"nv {nv/1e6:.1f}M{extra})", flush=True)
    return med


def main():
    pilots = [int(g) for g in sys.argv[1:]] or [8]
    builder = load_scene(
        "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
        overrides={"integrator": "gt", "samplesPerIteration": 4},
    )
    scene, cfg = builder.build()
    cfg.max_depth = 10
    cfg.rr_depth = 10
    for spp in (48,):
        for p in pilots:
            time_run(
                lambda s, p=p, spp=spp: render_pool_fused_sorted(
                    scene, jax.random.PRNGKey(s), spp=spp, spp_pilot=p,
                    width=cfg.width, height=cfg.height,
                    max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
                    fov_axis=cfg.fov_axis, bsdf_types=tuple(cfg.bsdf_types),
                ),
                f"sorted spp={spp} pilot={p}",
            )


if __name__ == "__main__":
    main()
