"""A/B: striped vs shuffled megakernel pool on the reference cornell box.

Usage: python scripts/bench_shuffled.py [groups ...]
Times each variant with value fetches (median of 5), per PERF.md's relay
measurement rules. Run alone — never while pytest occupies the host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sdmm_tpu.utils.cache import enable as enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402

from sdmm_tpu.render.wavefront import (  # noqa: E402
    render_pool_fused_shuffled,
    render_pool_fused_striped,
)
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
    print(f"{label}: {med/1e6:.1f} Mrays/s (steps {steps:.0f}, "
          f"nv {nv/1e6:.1f}M, occ~{nv and 0 or 0:.2f})", flush=True)
    return med


def main():
    groups_list = [int(g) for g in sys.argv[1:]] or [4, 8, 16]
    builder = load_scene(
        "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
        overrides={"integrator": "gt", "samplesPerIteration": 4},
    )
    scene, cfg = builder.build()
    cfg.max_depth = 10
    cfg.rr_depth = 10
    spp = 48
    common = dict(
        spp=spp, width=cfg.width, height=cfg.height,
        max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
        fov_axis=cfg.fov_axis, bsdf_types=tuple(cfg.bsdf_types),
    )

    from sdmm_tpu.render.wavefront import render_pool_fused_blocked

    time_run(
        lambda s: render_pool_fused_blocked(
            scene, jax.random.PRNGKey(s), **common),
        "blocked+tileskip",
    )
    if "--all" in sys.argv:
        time_run(
            lambda s: render_pool_fused_striped(
                scene, jax.random.PRNGKey(s), **common),
            "striped",
        )
        for g in groups_list:
            time_run(
                lambda s, g=g: render_pool_fused_shuffled(
                    scene, jax.random.PRNGKey(s), groups=g, **common),
                f"shuffled groups={g}",
            )


if __name__ == "__main__":
    main()
