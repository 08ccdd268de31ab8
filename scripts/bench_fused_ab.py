#!/usr/bin/env python
"""A/B timing of the wavefront drivers on the real TPU.

Usage: python scripts/bench_fused_ab.py [--spp N] [--lanes LOG2] [--skip-xla]
Run ALONE — this host has 2 vCPUs and concurrent CPU load starves the
axon relay (see memory: tpu-bench-isolation).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=12)
    ap.add_argument("--lanes", type=int, default=17, help="log2 n_lanes")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from sdmm_tpu.utils.cache import enable as enable_cache

    enable_cache()
    import jax

    from sdmm_tpu.render.wavefront import render_pool, render_pool_fused
    from sdmm_tpu.scene.xml_loader import load_scene

    b = load_scene(
        "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
        overrides={"integrator": "gt", "samplesPerIteration": 4},
    )
    scene, cfg = b.build()
    cfg.max_depth = 10
    cfg.rr_depth = 10
    n_lanes = 1 << args.lanes
    spp = args.spp

    def bench(fn, name, **kw):
        out = fn(scene, jax.random.PRNGKey(0), n_lanes=n_lanes, spp=spp,
                 width=cfg.width, height=cfg.height, max_depth=10,
                 rr_depth=10, fov_axis=cfg.fov_axis, **kw)
        jax.block_until_ready(out["image"])
        best = 0.0
        for i in range(args.iters):
            t0 = time.perf_counter()
            out = fn(scene, jax.random.PRNGKey(1 + i), n_lanes=n_lanes,
                     spp=spp, width=cfg.width, height=cfg.height,
                     max_depth=10, rr_depth=10, fov_axis=cfg.fov_axis, **kw)
            jax.block_until_ready(out["image"])
            dt = time.perf_counter() - t0
            r = float(out["n_vertices"]) / dt / 1e6
            best = max(best, r)
            print(f"  {name} iter{i}: {r:.2f} Mrays/s (dt {dt:.3f}s, "
                  f"steps {int(out['steps'])})")
        print(f"{name}: best {best:.2f} Mrays/s")
        return best

    if not args.skip_xla:
        bench(render_pool, "xla_pool", nee=True,
              bsdf_types=tuple(cfg.bsdf_types))
    bench(render_pool_fused, "fused", bsdf_types=tuple(cfg.bsdf_types))


if __name__ == "__main__":
    main()
