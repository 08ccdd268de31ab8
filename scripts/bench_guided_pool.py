#!/usr/bin/env python
"""Guided-renderer timing: scan waves vs regenerating pool, on real TPU.

Trains briefly on the cornell box, then times one pure-render iteration
both ways. Run ALONE (2-vCPU host; see memory: tpu-bench-isolation).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from sdmm_tpu.utils.cache import enable as enable_cache

    enable_cache()
    import jax
    import numpy as np

    from sdmm_tpu.guiding import em as em_mod
    from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig
    from sdmm_tpu.scene.xml_loader import load_scene

    b = load_scene(
        "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
        overrides={"integrator": "sdmm", "samplesPerIteration": 4},
    )
    scene, cfg = b.build()
    cfg.max_depth = 10
    cfg.rr_depth = 10

    tc = TrainerConfig(
        samples_per_iteration=4, rays_per_wave=1 << 16,
        em=em_mod.EMConfig(batch_size=1 << 20),
    )
    tr = SDMMTrainer(scene, cfg, tc)
    # Short training phase (16 spp trained of 64 budget).
    t0 = time.time()
    tr.run(total_spp=16)
    print(f"train 16spp: {time.time() - t0:.1f}s")

    n_pix = cfg.width * cfg.height

    # Pool path = render_iteration(collect=False); scan path =
    # render_iteration(collect=True) (same waves the old code always ran,
    # plus sample outputs that the XLA DCE cannot remove — close enough
    # for the scheduling comparison).
    t0 = time.time()
    image, sqr, weight, _ = tr.render_iteration(collect=False)
    jax.block_until_ready(image)
    print(f"pool iter compile+run: {time.time() - t0:.1f}s")
    t0 = time.time()
    image, sqr, weight, _ = tr.render_iteration(collect=False)
    jax.block_until_ready(image)
    dt_pool = time.time() - t0
    verts = tr._last_mean_path_length * n_pix * tc.samples_per_iteration
    print(f"pool iter: {dt_pool:.2f}s  {verts / dt_pool / 1e6:.2f} Mrays/s")

    t0 = time.time()
    image, sqr, weight, batches = tr.render_iteration(collect=True)
    jax.block_until_ready(image)
    print(f"scan iter compile+run: {time.time() - t0:.1f}s")
    t0 = time.time()
    image, sqr, weight, batches = tr.render_iteration(collect=True)
    jax.block_until_ready(image)
    dt_scan = time.time() - t0
    nv = float(np.asarray(
        sum(jax.numpy.sum(s["valid"]) for s in batches)
    ))
    print(f"scan iter: {dt_scan:.2f}s  ~{nv / dt_scan / 1e6:.2f} Mrays/s "
          f"(cacheable vertices only)")
    print(f"pool/scan wall speedup: {dt_scan / dt_pool:.2f}x")


if __name__ == "__main__":
    main()
