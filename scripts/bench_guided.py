"""Guided-path throughput: SDMM-guided rays/s/chip on the cornell box.

Trains the guiding tree for a few iterations (protocol config: 16
components, 4 spp/iter), then times pure guided render iterations via
render_pool_guided — the VERDICT round-2 'guided rays/s within 2x of
unguided' gate. Run alone (relay measurement rules, PERF.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sdmm_tpu.utils.cache import enable as enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402

from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig  # noqa: E402
from sdmm_tpu.render.guided import (  # noqa: E402
    guided_fused_supported, render_pool_guided, render_pool_guided_fused,
    render_pool_guided_sorted2, render_pool_guided_striped,
)
from sdmm_tpu.scene.xml_loader import load_scene  # noqa: E402


def main():
    train_spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    builder = load_scene(
        "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
        overrides={"integrator": "sdmm", "samplesPerIteration": 4},
    )
    scene, cfg = builder.build()
    cfg.max_depth = 10
    cfg.rr_depth = 10

    tr = SDMMTrainer(scene, cfg)
    t0 = time.perf_counter()
    tr.run(train_spp, verbose=False)
    t_train = time.perf_counter() - t0
    gs = tr.guide_state()
    n_leaves = int(tr.tree.n_leaves)
    print(f"trained {train_spp} spp in {t_train:.1f}s", flush=True)

    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_lanes = 1 << 17

    def run(seed, use_kernel):
        return render_pool_guided(
            scene, gs, jax.random.PRNGKey(seed), n_lanes=n_lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth, bsdf_fraction=0.5,
            bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
            use_kernel=use_kernel,
        )

    def run_fused(seed):
        return render_pool_guided_fused(
            scene, gs, jax.random.PRNGKey(seed), n_lanes=n_lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth, bsdf_fraction=0.5,
            bsdf_types=tuple(cfg.bsdf_types), fov_axis=cfg.fov_axis,
        )

    assert guided_fused_supported(scene, cfg, gs)
    def run_striped(seed):
        return render_pool_guided_striped(
            scene, gs, jax.random.PRNGKey(seed), spp=spp,
            width=cfg.width, height=cfg.height, max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth, bsdf_fraction=0.5,
            bsdf_types=tuple(cfg.bsdf_types), fov_axis=cfg.fov_axis,
        )

    def run_sorted2(seed):
        return render_pool_guided_sorted2(
            scene, gs, jax.random.PRNGKey(seed), spp=spp,
            width=cfg.width, height=cfg.height, spp_pilot=min(8, spp // 2),
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            bsdf_fraction=0.5, bsdf_types=tuple(cfg.bsdf_types),
            fov_axis=cfg.fov_axis,
        )

    runners = [("xla", lambda s: run(s, False)),
               ("pallas-kernel", lambda s: run(s, True)),
               ("fused", run_fused),
               ("striped", run_striped),
               ("sorted2", run_sorted2)]
    for label, rn in runners:
        for w in range(2):
            float(rn(w)["n_vertices"])
        rates = []
        for i in range(2, 7):
            t0 = time.perf_counter()
            out = rn(i)
            nv = float(out["n_vertices"])
            dt = time.perf_counter() - t0
            rates.append(nv / dt)
        rates.sort()
        med = rates[len(rates) // 2]
        print(f"guided[{label}]: {med/1e6:.2f} Mrays/s/chip (steps "
              f"{float(out['steps']):.0f}, nv {nv/1e6:.1f}M)", flush=True)


if __name__ == "__main__":
    main()
