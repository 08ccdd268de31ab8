#!/usr/bin/env python
"""Firefly anatomy probe (round 5).

Loads a trained guide checkpoint and measures, at first-bounce hit points
across the image, how much probability mass the conditional puts toward
the (known) area light versus a cosine baseline. A "blind" conditional
(guide pdf toward the light << cosine pdf) forces every bounce through
the BSDF half of the one-sample MIS at ~(1/h)x weight amplification —
the compounding mechanism behind the firefly tail (GAPS.md #3).

Usage: python scripts/diag_anatomy.py --ckpt /tmp/diag_q/sdmm_model.ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/test-suite/scenes/"
                    "cornell-box/cornell-box.xml")
    ap.add_argument("--ckpt", default="/tmp/diag_quality/sdmm_model.ckpt")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--inflate", type=float, default=0.0,
                    help="post-hoc spatial covariance floor as a fraction "
                    "of leaf extent (sweeps EMConfig.spatial_floor_frac "
                    "without retraining)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu.guiding import mixture as mix
    from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig
    from sdmm_tpu.guiding import stree
    from sdmm_tpu.render.guided import canonical
    from sdmm_tpu.render.intersect import intersect, surface_interaction
    from sdmm_tpu.scene.sensor import generate_rays
    from sdmm_tpu.scene.xml_loader import load_scene

    builder = load_scene(args.scene, overrides={"integrator": "gt"})
    scene, cfg = builder.build()
    cfg.width, cfg.height = args.width, args.height
    trainer = SDMMTrainer(scene, cfg, TrainerConfig())
    trainer.restore(args.ckpt)
    if args.inflate > 0.0:
        import jax.numpy as jnp2

        ext = trainer.tables["leaf_hi"] - trainer.tables["leaf_lo"]
        floor = (args.inflate * ext) ** 2  # [L, 3]
        cov = trainer.sdmm.cov.at[..., :3, :3].add(
            floor[:, None, :, None] * jnp2.eye(3))
        trainer.sdmm = trainer.sdmm._replace(cov=cov)
        trainer.prep = mix.prepare(trainer.sdmm)
        trainer._bump_model_version()
    gs = trainer.guide_state()

    # Light geometry: emissive triangle centroids.
    em_tris = np.asarray(scene.em_tri_idx)
    v0 = np.asarray(scene.tri_v0)[em_tris]
    e1 = np.asarray(scene.tri_e1)[em_tris]
    e2 = np.asarray(scene.tri_e2)[em_tris]
    light_c = (v0 + (e1 + e2) / 3.0).mean(axis=0)
    print("light centroid:", light_c)

    ys = np.arange(0, args.height, args.stride)
    xs = np.arange(0, args.width, args.stride)
    px, py = np.meshgrid(xs + 0.5, ys + 0.5)
    pix = jnp.asarray(
        np.stack([px.ravel(), py.ravel()], axis=-1), jnp.float32)
    ro, rd = generate_rays(scene, pix, args.width, args.height, cfg.fov_axis)
    hit = intersect(scene, ro, rd)
    it = surface_interaction(scene, ro, rd, hit)
    valid = np.asarray(hit["valid"])

    p = it["p"]
    to_light = jnp.asarray(light_c)[None, :] - p
    dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
    d_light = to_light / jnp.maximum(dist, 1e-9)
    cos_term = jnp.abs(jnp.sum(it["ns"] * d_light, axis=-1))
    cos_pdf = cos_term / jnp.pi

    c_pos = canonical(gs, p)
    leaf = stree.find_leaf(gs.tables, c_pos)
    w_g, prep_g, use_guide = (
        mix.unpack_conditioning(gs.packed[leaf], gs.sdmm.weight.shape[-1])
        if gs.packed is not None
        else (gs.sdmm.weight[leaf],
              jax.tree.map(lambda x: x[leaf], gs.prep),
              gs.initialized[leaf])
    )
    cond = mix.create_conditional(prep_g, w_g, c_pos)
    pdf_g = np.asarray(mix.conditional_pdf(cond, d_light))
    cond_valid = np.asarray(cond.valid & use_guide)
    cos_pdf = np.asarray(cos_pdf)

    # Also: total conditional mass within the light's solid-angle cone.
    # Monte-Carlo from the conditional itself: fraction of sampled
    # directions that hit an emissive triangle.
    k = jax.random.PRNGKey(7)
    frac_hits = np.zeros(len(np.asarray(leaf)))
    n_mc = 32
    for i in range(n_mc):
        d_s, ok = mix.conditional_sample(cond, jax.random.fold_in(k, i))
        ro2 = p + np.asarray(it["ng"]) * 1e-4 * np.sign(
            np.sum(np.asarray(d_s) * np.asarray(it["ng"]), -1, keepdims=True))
        h2 = intersect(scene, jnp.asarray(ro2), d_s)
        it2 = surface_interaction(scene, jnp.asarray(ro2), d_s, h2)
        frac_hits += np.asarray(
            (it2["emitter"] >= 0) & ok & jnp.asarray(cond_valid))
    frac_hits /= n_mc

    # Failure localization: per-component conditional pdf at d_light.
    # max_k >> weighted sum  -> the SPATIAL WEIGHTING picks the wrong
    #                          components (conditioning failure);
    # max_k ~ 0 everywhere   -> the leaf mixture has no light lobe at all
    #                          (EM/training failure);
    # wide-cov retry large   -> lobes point right but are too TIGHT.
    import sdmm_tpu.guiding.tangent as tgm

    t_l, aos_l, ok_l = tgm.log_map(cond.rot, d_light[:, None, :])
    z_l = jnp.einsum("...ij,...j->...i", cond.inv_chol, t_l)
    pdf_k = (0.3989422804014327 ** 2 * jnp.exp(
        -0.5 * jnp.sum(z_l * z_l, -1)) * cond.inv_det * aos_l)
    pdf_k = jnp.where(ok_l, pdf_k, 0.0)
    pdf_best = np.asarray(jnp.max(pdf_k, axis=-1))
    # Angular distance from each probe's best-weighted component mean to
    # the light direction (mispointing vs tightness).
    best_k = jnp.argmax(cond.weight, axis=-1)
    mu_best = jnp.take_along_axis(
        cond.mu_dir, best_k[:, None, None], axis=1)[:, 0]
    ang_best = np.asarray(jnp.degrees(jnp.arccos(jnp.clip(
        jnp.sum(mu_best * d_light, -1), -1, 1))))
    # Nearest-component whitened spatial distance (extrapolation check).
    c_cen = c_pos[:, None, :] - prep_g.mu_a
    z_sp = jnp.einsum("...ij,...j->...i", prep_g.marg_inv_chol, c_cen)
    zmin = np.asarray(jnp.min(jnp.where(
        prep_g.valid, jnp.linalg.norm(z_sp, axis=-1), np.inf), axis=-1))

    # Visibility: a probe whose view of the light is occluded SHOULD have
    # no light lobe — only visible-and-blind probes are failures.
    from sdmm_tpu.render.intersect import occluded as occ_fn

    occ = np.asarray(occ_fn(
        scene,
        p + it["ng"] * 1e-4 * jnp.sign(
            jnp.sum(d_light * it["ng"], -1, keepdims=True)),
        d_light, dist[:, 0] * 0.98))

    sel = valid & cond_valid & (cos_pdf > 1e-3)
    ratio = pdf_g[sel] / np.maximum(cos_pdf[sel], 1e-9)
    blind = sel & (pdf_g / np.maximum(cos_pdf, 1e-9) < 0.05)
    vis_sel = sel & ~occ
    vis_blind = blind & ~occ
    out = {
        "n_probes": int(valid.sum()),
        "pct_cond_valid": float(100 * cond_valid[valid].mean()),
        "ratio_quantiles": {
            str(q): float(np.percentile(ratio, q))
            for q in (1, 5, 10, 25, 50, 75, 90, 99)
        },
        "pct_blind_0.05": float(100 * (ratio < 0.05).mean()),
        "pct_blind_0.2": float(100 * (ratio < 0.2).mean()),
        "pct_visible": float(100 * vis_sel.sum() / max(1, sel.sum())),
        "pct_blind_of_visible": float(
            100 * vis_blind.sum() / max(1, vis_sel.sum())),
        "mean_light_hit_fraction": float(frac_hits[sel].mean()),
        "p10_light_hit_fraction": float(np.percentile(frac_hits[sel], 10)),
        "blind_probes": {
            "n": int(blind.sum()),
            "best_component_pdf_at_light_quantiles": {
                str(q): float(np.percentile(pdf_best[blind], q))
                for q in (10, 50, 90)
            },
            "weighted_vs_best_median": float(np.median(
                pdf_g[blind] / np.maximum(pdf_best[blind], 1e-30))),
            "angle_bestweight_mean_to_light_deg": {
                str(q): float(np.percentile(ang_best[blind], q))
                for q in (10, 50, 90)
            },
            "zmin_spatial_quantiles": {
                str(q): float(np.percentile(zmin[blind], q))
                for q in (10, 50, 90)
            },
        },
        "nonblind_zmin_median": float(np.median(zmin[sel & ~blind]))
        if (sel & ~blind).any() else None,
    }
    print(json.dumps(out, indent=2))

    # Blindness map for eyeballing (probe grid resolution).
    bm = np.zeros(valid.shape)
    bm[sel] = (pdf_g[sel] / np.maximum(cos_pdf[sel], 1e-9) < 0.2)
    bm = bm.reshape(len(ys), len(xs))
    np.save(os.path.join(os.path.dirname(args.ckpt), "blind_map.npy"), bm)
    print("blind-map saved; blind fraction by image row (top->bottom):")
    print(np.round(bm.mean(axis=1), 2).tolist())


if __name__ == "__main__":
    main()
