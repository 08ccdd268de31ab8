#!/usr/bin/env python
"""Cross-integrator comparison tables — the reference's
scripts/make_comparisons.py equivalent (reference: make_comparisons.py:29-121
builds LaTeX/figure tables of MrSE/MAPE/SMAPE per scene x method).

Renders each (scene, integrator) cell via the CLI machinery, computes the
metric suite against a ground-truth render, and writes a markdown table +
a CSV next to the output directory.

Usage:
    python scripts/make_comparisons.py --scenes cornell-box \
        --integrators path gt sdmm ppg --spp 64 --gt-spp 512 \
        --width 160 --height 90 -o /tmp/cmp
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SCENE_DIR = "/root/reference/test-suite/scenes"


def render_cell(scene_xml, integrator, spp, width, height, out_path):
    from sdmm_tpu.cli import main as cli_main

    rc = cli_main([
        "render", scene_xml, "-o", out_path, "--spp", str(spp),
        "--width", str(width), "--height", str(height),
        "--integrator", integrator,
    ])
    if rc not in (0, None):
        raise RuntimeError(f"render failed: {integrator}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=["cornell-box"])
    ap.add_argument("--integrators", nargs="+",
                    default=["path", "gt", "sdmm"])
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--gt-spp", type=int, default=512)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=90)
    ap.add_argument("-o", "--out", default="/tmp/sdmm_comparisons")
    args = ap.parse_args()

    from sdmm_tpu.utils.exr import read_exr
    from sdmm_tpu.utils.metrics import all_metrics as image_metrics

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for scene in args.scenes:
        xml = os.path.join(SCENE_DIR, scene, f"{scene}.xml")
        gt_path = os.path.join(args.out, f"{scene}_gt.exr")
        render_cell(xml, "gt", args.gt_spp, args.width, args.height, gt_path)
        gt = read_exr(gt_path)
        for integ in args.integrators:
            out_path = os.path.join(args.out, f"{scene}_{integ}.exr")
            render_cell(xml, integ, args.spp, args.width, args.height,
                        out_path)
            img = read_exr(out_path)
            m = image_metrics(img, gt)
            rows.append({"scene": scene, "integrator": integ,
                         "spp": args.spp, **m})
            print(f"{scene:>20} {integ:>12}  "
                  + "  ".join(f"{k}={v:.4g}" for k, v in m.items()))

    csv_path = os.path.join(args.out, "comparisons.csv")
    with open(csv_path, "w", newline="") as f:
        wcsv = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        wcsv.writeheader()
        wcsv.writerows(rows)

    md_path = os.path.join(args.out, "comparisons.md")
    keys = [k for k in rows[0] if k not in ("scene", "integrator", "spp")]
    with open(md_path, "w") as f:
        f.write("| scene | integrator | spp | " + " | ".join(keys) + " |\n")
        f.write("|" + "---|" * (3 + len(keys)) + "\n")
        for r in rows:
            f.write(f"| {r['scene']} | {r['integrator']} | {r['spp']} | "
                    + " | ".join(f"{r[k]:.4g}" for k in keys) + " |\n")
    print(f"wrote {csv_path} and {md_path}")


if __name__ == "__main__":
    main()
