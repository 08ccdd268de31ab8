#!/usr/bin/env python
"""Guide-quality diagnostic (round 5, VERDICT #1).

Isolates the trained guide's quality from the iteration-combination
machinery: after the protocol training run, render a PURE guided image at
--probe-spp with the frozen model and compare MAPE/MrSE against an
unguided path render at the SAME spp, plus the PPG trainer's final
iteration. Also dumps per-iteration MAPE for the sdmm run.

Usage: python scripts/diag_quality.py [--width 320 --height 180 ...]
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
    ap.add_argument("--scene", default="/root/reference/test-suite/scenes/"
                    "cornell-box/cornell-box.xml")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--gt-spp", type=int, default=4096)
    ap.add_argument("--probe-spp", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--out", default="/tmp/diag_quality")
    ap.add_argument("--skip-ppg", action="store_true")
    ap.add_argument("--bsdf-fraction", type=float, default=0.5)
    ap.add_argument("--tail-chunk", type=int, default=64)
    ap.add_argument("--floor", type=float, default=-1.0,
                    help="override EMConfig.spatial_floor_frac")
    args = ap.parse_args()

    from sdmm_tpu.utils.cache import enable as enable_cache

    enable_cache()
    import numpy as np

    from sdmm_tpu.render.wavefront import render_wavefront
    from sdmm_tpu.scene.xml_loader import load_scene
    from sdmm_tpu.utils.exr import write_exr
    from sdmm_tpu.utils.metrics import all_metrics

    os.makedirs(args.out, exist_ok=True)
    builder = load_scene(args.scene, overrides={"integrator": "gt"})
    scene, cfg = builder.build()
    cfg.width, cfg.height = args.width, args.height
    cfg.max_depth = args.max_depth
    cfg.rr_depth = args.max_depth

    gt_path = os.path.join(
        args.out, f"gt_{args.width}x{args.height}_{args.gt_spp}.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        t0 = time.time()
        chunk = min(args.gt_spp, 512)
        acc = None
        for ci in range(args.gt_spp // chunk):
            g = render_wavefront(scene, cfg, spp=chunk, seed=99 + ci,
                                 nee=True)
            img_c = np.asarray(g["image"])
            acc = img_c if acc is None else acc + img_c
        gt = acc / max(1, args.gt_spp // chunk)
        np.save(gt_path, gt)
        print(f"GT: {time.time()-t0:.1f}s", flush=True)

    out = {}

    # --- unguided path at probe spp and at full budget ---
    for spp in (args.probe_spp, args.spp):
        t0 = time.time()
        r = render_wavefront(scene, cfg, spp=spp, seed=1, nee=False)
        m = all_metrics(np.asarray(r["image"]), gt)
        m["seconds"] = time.time() - t0
        out[f"path_{spp}"] = m
        print(f"path@{spp}: {json.dumps(m)}", flush=True)

    # --- sdmm protocol training ---
    from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig

    per_iter = []

    def on_iter(tr, it):
        n = np.maximum(it["weight"], 1.0)[:, None]
        img = (it["image"] / n).reshape(args.height, args.width, 3)
        m = all_metrics(img, gt)
        per_iter.append({
            "iteration": tr.iteration, "spp": tr.stats[-1]["spp"],
            "mape": m["mape"], "mrse": m["mrse"],
            "active": tr.stats[-1]["active_nodes_count"],
            "leaves": tr.stats[-1]["leaf_nodes_count"],
        })

    t0 = time.time()
    from sdmm_tpu.guiding import em as em_mod

    em_cfg = em_mod.EMConfig() if args.floor < 0 else em_mod.EMConfig(
        spatial_floor_frac=args.floor)
    trainer = SDMMTrainer(scene, cfg, TrainerConfig(
        tail_chunk_spp=args.tail_chunk, optimize_async=True,
        bsdf_fraction=args.bsdf_fraction, em=em_cfg))
    img, iters = trainer.run(total_spp=args.spp, on_iteration=on_iter)
    m = all_metrics(np.asarray(img), gt)
    m["seconds"] = time.time() - t0
    out["sdmm_combined"] = m
    print(f"sdmm combined: {json.dumps(m)}", flush=True)
    write_exr(os.path.join(args.out, "sdmm.exr"), np.asarray(img))
    np.savez_compressed(
        os.path.join(args.out, "sdmm_iters.npz"),
        image=np.stack([it["image"] for it in iters]),
        sqr=np.stack([it["sqr"] for it in iters]),
        weight=np.stack([it["weight"] for it in iters]),
    )
    # Guide-model checkpoint for offline anatomy probes.
    from sdmm_tpu.guiding import io as gio

    gio.save_full_checkpoint(
        os.path.join(args.out, "sdmm_model.ckpt"), trainer, [])

    # --- pure guided probe with the frozen model ---
    t0 = time.time()
    image, sqr, weight, _ = trainer.render_iteration(
        collect=False, spp=args.probe_spp)
    n = np.maximum(np.asarray(weight), 1.0)[:, None]
    probe = (np.asarray(image) / n).reshape(args.height, args.width, 3)
    m = all_metrics(probe, gt)
    m["seconds"] = time.time() - t0
    var = np.maximum(
        np.asarray(sqr) / n - (np.asarray(image) / n) ** 2, 0.0
    ) / np.maximum(n - 1, 1)
    m["mean_pixel_variance"] = float(var.mean())
    m["p50_var"] = float(np.percentile(var.mean(-1), 50))
    m["p99_var"] = float(np.percentile(var.mean(-1), 99))
    m["max_var"] = float(var.max())
    out[f"sdmm_probe_{args.probe_spp}"] = m
    print(f"sdmm probe@{args.probe_spp}: {json.dumps(m)}", flush=True)
    write_exr(os.path.join(args.out, "sdmm_probe.exr"), probe)

    # variance profile of the equal-spp path render for comparison
    r = render_wavefront(scene, cfg, spp=args.probe_spp, seed=3, nee=False)
    n = np.maximum(np.asarray(r["weight"]), 1.0)[..., None]
    mean = np.asarray(r["raw"]) / n
    var = np.maximum(np.asarray(r["sqr"]) / n - mean * mean, 0.0) \
        / np.maximum(n - 1, 1)
    out[f"path_var_{args.probe_spp}"] = {
        "mean_pixel_variance": float(var.mean()),
        "p50_var": float(np.percentile(var.mean(-1), 50)),
        "p99_var": float(np.percentile(var.mean(-1), 99)),
        "max_var": float(var.max()),
    }
    print(f"path var@{args.probe_spp}: "
          f"{json.dumps(out[f'path_var_{args.probe_spp}'])}", flush=True)

    if not args.skip_ppg:
        from sdmm_tpu.guiding.ppg import PPGConfig, PPGTrainer

        t0 = time.time()
        ppg = PPGTrainer(scene, cfg, PPGConfig())
        pimg, piters = ppg.run(total_spp=args.spp)
        m = all_metrics(np.asarray(pimg), gt)
        m["seconds"] = time.time() - t0
        out["ppg_combined"] = m
        print(f"ppg combined: {json.dumps(m)}", flush=True)
        last = piters[-1]
        n = np.maximum(last["weight"], 1.0)[:, None]
        m = all_metrics(
            (last["image"] / n).reshape(args.height, args.width, 3), gt)
        m["spp"] = last["spp"]
        out["ppg_last_iter"] = m
        print(f"ppg last iter ({last['spp']} spp): {json.dumps(m)}",
              flush=True)

    out["sdmm_per_iteration"] = per_iter
    with open(os.path.join(args.out, "diag.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
