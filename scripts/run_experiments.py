#!/usr/bin/env python
"""Experiment harness: scene × integrator matrix with metrics vs GT.

Equivalent of the reference's scripts/run_tests.py + combine_renders.py +
test_suite_utils.py: renders each (scene, integrator) cell, computes
MAPE/MrSE/SMAPE/L1/L2/SSIM against a ground-truth render, and writes a
results.json + per-run stats.json/EXRs under --out.

Ground truth: rendered on the fly with the NEE path tracer at --gt-spp
(the reference's GT EXRs are git-lfs stubs in this checkout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="+", help="scene XML paths")
    ap.add_argument("--integrators", default="gt,path,sdmm")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--gt-spp", type=int, default=512)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=90)
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    from sdmm_tpu.utils.cache import enable as enable_cache

    enable_cache()
    import numpy as np

    from sdmm_tpu.render.renderer import render
    from sdmm_tpu.scene.xml_loader import load_scene
    from sdmm_tpu.utils.exr import write_exr
    from sdmm_tpu.utils.metrics import all_metrics

    os.makedirs(args.out, exist_ok=True)
    results = {}
    for scene_path in args.scenes:
        name = os.path.basename(os.path.dirname(scene_path)) or os.path.basename(scene_path)
        builder = load_scene(scene_path, overrides={
            "integrator": "gt", "samplesPerIteration": 4,
        })
        scene, cfg = builder.build()
        cfg.width, cfg.height = args.width, args.height
        scene_dir = os.path.join(args.out, name)
        os.makedirs(scene_dir, exist_ok=True)

        print(f"[{name}] rendering GT @ {args.gt_spp} spp...", flush=True)
        t0 = time.time()
        from sdmm_tpu.render.wavefront import render_wavefront

        gt = render_wavefront(scene, cfg, spp=args.gt_spp, seed=99, nee=True)
        gt_img = np.asarray(gt["image"])  # already weight-normalized [H,W,3]
        write_exr(os.path.join(scene_dir, "gt.exr"), gt_img)
        print(f"[{name}] GT done in {time.time()-t0:.1f}s")

        results[name] = {}
        for integ in args.integrators.split(","):
            t0 = time.time()
            if integ == "sdmm":
                from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig

                trainer = SDMMTrainer(scene, cfg, TrainerConfig())
                img, _ = trainer.run(total_spp=args.spp)
                stats = trainer.stats
            elif integ == "ppg":
                from sdmm_tpu.guiding.ppg import PPGConfig, PPGTrainer

                ppg = PPGTrainer(scene, cfg, PPGConfig())
                img, _ = ppg.run(total_spp=args.spp)
                stats = ppg.stats
            else:
                res = render_wavefront(scene, cfg, spp=args.spp, seed=1,
                                       nee=(integ in ("gt", "volpath")))
                img = np.asarray(res["image"])
                stats = None
            secs = time.time() - t0
            m = all_metrics(img, gt_img)
            m["seconds"] = secs
            if stats:
                for k in ("mean_pixel_variance", "ttuv"):
                    if k in stats[-1]:
                        m[k] = stats[-1][k]
            results[name][integ] = m
            write_exr(os.path.join(scene_dir, f"{integ}.exr"), np.asarray(img))
            if stats is not None:
                with open(os.path.join(scene_dir, f"{integ}_stats.json"), "w") as f:
                    json.dump(stats, f, indent=2)
            print(f"[{name}] {integ}: {json.dumps(m)}")

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
