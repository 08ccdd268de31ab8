"""Benchmark: path-tracing throughput on the reference Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: path vertices traced per second per chip ("rays/s" in the
reference's accounting — BASELINE.md derives ~146 M rays/s for the
cornell-box GT run on a 128-core CPU cluster; vs_baseline is measured
single-chip throughput divided by that full-cluster number).

Uses the regenerating wavefront pool (render/wavefront.py): every lane
restarts on the next camera sample when its path dies, so occupancy stays
high across the path-length distribution.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 146e6  # cornell-box GT, 128 CPU cores (BASELINE.md)


def main():
    from sdmm_tpu.utils.cache import enable as enable_cache

    enable_cache()
    import jax

    from sdmm_tpu.render.wavefront import render_pool
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

    n_lanes = 1 << 17
    spp = 192  # GT-style throughput regime (reference GT runs use 1e5 spp)

    from sdmm_tpu.render.wavefront import (
        fused_supported,
        render_pool_fused_sorted2,
    )

    use_fused = (
        jax.default_backend() not in ("cpu",)
        and fused_supported(scene, cfg)
        and os.environ.get("SDMM_TPU_NO_FUSED") != "1"
    )
    if use_fused:
        # The megakernel's first Mosaic compile is untested on this relay;
        # probe it in a subprocess with a hard timeout so a pathological
        # compile cannot eat the whole bench budget. A successful probe
        # warms the persistent compile cache for the in-process run.
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c", (
                    "import sys; sys.path.insert(0, %r);"
                    "import bench_probe_fused" % os.path.dirname(
                        os.path.abspath(__file__))
                )],
                check=True, timeout=900, capture_output=True,
            )
        except Exception as e:
            print(f"# fused probe failed ({type(e).__name__}); "
                  "falling back to the XLA pool", file=sys.stderr)
            use_fused = False

    def run(seed):
        if use_fused:
            # Pilot + cost-sorted pool over the fully-fused step kernel
            # (regen + camera + PRNG + bounce + film in one pallas_call;
            # equal-cost tiles drain together and skip at DMA cost).
            return render_pool_fused_sorted2(
                scene, jax.random.PRNGKey(seed), spp=spp, spp_pilot=8,
                width=cfg.width, height=cfg.height, max_depth=cfg.max_depth,
                rr_depth=cfg.rr_depth, fov_axis=cfg.fov_axis,
                bsdf_types=tuple(cfg.bsdf_types),
            )
        return render_pool(
            scene, jax.random.PRNGKey(seed), n_lanes=n_lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth, nee=True,
            bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
        )

    # Warmup/compile. A VALUE fetch (not block_until_ready) is required:
    # through the axon relay block_until_ready can return before the
    # program has actually compiled+run, and the first value fetch then
    # absorbs a minutes-long lazy Mosaic compile.
    for w in range(2):
        float(run(w)["n_vertices"])

    # Median of per-iteration throughput: robust to one relay hiccup
    # (observed: a single iteration absorbing a deferred recompile).
    rates = []
    for i in range(2, 7):
        t0 = time.perf_counter()
        nv = float(run(i)["n_vertices"])
        dt = time.perf_counter() - t0
        rates.append(nv / dt)
    rates.sort()
    rays_per_s = rates[len(rates) // 2]

    # Guided (flagship-path) throughput at protocol-cadence spp — the
    # headline unguided number alone flattered a regime the protocol
    # never runs in (VERDICT r3 weak #5 / next #10). Train a small guide
    # first so conditionals are real, then time the guided engine.
    guided_rate = 0.0
    try:
        guided_rate = bench_guided(scene, cfg)
    except Exception as e:  # keep the headline metric robust
        print(f"# guided bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    if guided_rate > 0.0:
        print(json.dumps({
            "metric": "cornell_box_guided_vertices_per_s_per_chip",
            "value": round(guided_rate, 1),
            "unit": "rays/s",
            "vs_baseline": round(guided_rate / BASELINE_RAYS_PER_S, 4),
        }))

    print(
        json.dumps(
            {
                "metric": "cornell_box_path_vertices_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
                "guided_rays_per_s": round(guided_rate, 1),
            }
        )
    )


def bench_guided(scene, cfg):
    """Guided-engine throughput with a genuinely trained guide: 8
    protocol-style training iterations at quarter resolution (shared
    spatial tree/mixtures), then the production guided engine at
    640x360, spp=16 (the protocol-cadence regime, PERF.md round-3)."""
    import jax

    from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig

    cfg.width, cfg.height = 320, 180
    tr = SDMMTrainer(scene, cfg, TrainerConfig())
    for _ in range(8):
        img, sqr, wgt, batches = tr.render_iteration(collect=True)
        tr.optimize(batches)
        tr.iteration += 1
        tr.total_spp += 4
    cfg.width, cfg.height = 640, 360
    gs = tr.guide_state()
    on_tpu = jax.default_backend() not in ("cpu",)
    from sdmm_tpu.render.guided import (
        guided_fused_supported, render_pool_guided, render_pool_guided_fused,
    )

    use_fused = on_tpu and guided_fused_supported(scene, cfg, gs)

    def run(seed):
        if use_fused:
            return render_pool_guided_fused(
                scene, gs, jax.random.PRNGKey(seed), n_lanes=1 << 17,
                spp=16, width=640, height=360, max_depth=cfg.max_depth,
                rr_depth=cfg.rr_depth, bsdf_types=tuple(cfg.bsdf_types),
                fov_axis=cfg.fov_axis,
            )
        return render_pool_guided(
            scene, gs, jax.random.PRNGKey(seed), n_lanes=1 << 17,
            spp=16, width=640, height=360, max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth, bsdf_types=cfg.bsdf_types or None,
            fov_axis=cfg.fov_axis,
            use_kernel=on_tpu and gs.kernel_table is not None,
        )

    float(run(0)["n_vertices"])  # warm (value fetch; see above)
    rates = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        nv = float(run(i)["n_vertices"])
        rates.append(nv / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


if __name__ == "__main__":
    main()
