"""Area-emitter sampling for next-event estimation.

Equivalent of the reference's Scene::sampleEmitterDirect /
pdfEmitterDirect (reference: mitsuba/src/librender/scene.cpp) specialized to
area lights over the emissive-triangle CDF built at scene load, plus a
constant environment term (reference: mitsuba/src/emitters/constant.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import warp
from ..core.frame import normalize


def sample_env(scene, u2: jnp.ndarray):
    """Importance-sample the equirect envmap by luminance
    (reference: src/emitters/envmap.cpp sampleDirection via 2-D CDF).

    Returns (d_world [N,3], radiance [N,3], pdf_solid_angle [N]).
    """
    he, we = scene.env_pdf.shape
    row = jnp.clip(jnp.searchsorted(scene.env_row_cdf, u2[..., 0]), 0, he - 1)
    col = jnp.clip(
        jax.vmap(jnp.searchsorted)(scene.env_col_cdf[row], u2[..., 1]), 0, we - 1
    )
    theta = (row.astype(jnp.float32) + 0.5) * (jnp.pi / he)
    phi = ((col.astype(jnp.float32) + 0.5) / we - 0.5) * (2.0 * jnp.pi)
    st = jnp.sin(theta)
    # Inverse of env_eval's direction->uv mapping.
    dl = jnp.stack([st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1)
    d = jnp.einsum("ij,...j->...i", scene.env_to_world, dl)
    rad = scene.env_map[row, col] * scene.env_radiance
    return d, rad, scene.env_pdf[row, col]


def pdf_env_dir(scene, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of sampling direction d from the envmap CDF
    (for MIS weighting of BSDF-sampled escape rays)."""
    if scene.env_pdf.shape[0] <= 1:
        return jnp.zeros(d.shape[:-1])
    dl = jnp.einsum("ji,...j->...i", scene.env_to_world, d)
    he, we = scene.env_pdf.shape
    u = 0.5 + jnp.arctan2(dl[..., 0], -dl[..., 2]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(dl[..., 1], -1.0, 1.0)) / jnp.pi
    x = jnp.clip(((u % 1.0) * we).astype(jnp.int32), 0, we - 1)
    y = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    return scene.env_pdf[y, x]


def sample_direct(scene, p: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Direct-illumination sample (area triangles + delta lights + envmap).

    p: [N, 3] reference points; u1: [N]; u2: [N, 2]. The record's
    ``radiance`` already folds distance falloff for delta lights; ``pdf``
    is solid-angle for area/env samples and the discrete selection pmf for
    delta lights (``delta`` marks them; MIS weight must be 1 there).
    """
    n_rays = p.shape[0]
    m = scene.em_tri_idx.shape[0]
    n_pt = scene.pt_pos.shape[0]
    has_env = scene.env_pdf.shape[0] > 1
    zero = {
        "d": jnp.zeros_like(p), "dist": jnp.zeros(n_rays), "pdf": jnp.zeros(n_rays),
        "radiance": jnp.zeros_like(p), "n": jnp.zeros_like(p),
        "valid": jnp.zeros(n_rays, dtype=bool),
        "delta": jnp.zeros(n_rays, dtype=bool),
    }
    if m == 0 and n_pt == 0 and not has_env:
        return zero

    # Envmap branch: route env_select_prob of samples to the envmap CDF;
    # remaining probability is split between delta and area lights below.
    if has_env:
        env_prob = scene.env_select_prob
        pick_env = u1 < env_prob
        u1 = jnp.where(pick_env, u1 / jnp.maximum(env_prob, 1e-9),
                       (u1 - env_prob) / jnp.maximum(1.0 - env_prob, 1e-9))
        d_env, rad_env, pdf_env = sample_env(scene, u2)
        rec_env = {
            "d": d_env, "dist": jnp.full(n_rays, 1e7),
            "pdf": pdf_env * env_prob,
            "radiance": rad_env, "n": -d_env,
            "valid": pdf_env > 0.0,
            "delta": jnp.zeros(n_rays, dtype=bool),
        }
    else:
        env_prob = jnp.float32(0.0)
        pick_env = jnp.zeros(n_rays, dtype=bool)
        rec_env = zero

    rec = dict(zero)
    if n_pt:
        pt_prob = scene.pt_select_prob
        pick_pt = u1 < pt_prob
        # Re-stretch u1 within the chosen branch.
        u1 = jnp.where(pick_pt, u1 / jnp.maximum(pt_prob, 1e-9),
                       (u1 - pt_prob) / jnp.maximum(1.0 - pt_prob, 1e-9))
        sel_pt = jnp.clip(jnp.searchsorted(scene.pt_cdf, u2[..., 0]), 0, n_pt - 1)
        pmf_pt = scene.pt_cdf[sel_pt] - jnp.where(
            sel_pt > 0, scene.pt_cdf[jnp.maximum(sel_pt - 1, 0)], 0.0
        )
        kind = scene.pt_kind[sel_pt]
        to_l = scene.pt_pos[sel_pt] - p
        dist2 = jnp.sum(to_l * to_l, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d_pt = to_l / dist[..., None]
        # Directional lights: fixed direction toward the light, no falloff.
        is_dir = kind == 2
        d_pt = jnp.where(is_dir[..., None], scene.pt_pos[sel_pt], d_pt)
        dist = jnp.where(is_dir, 1e7, dist)
        inv_r2 = jnp.where(is_dir, 1.0, 1.0 / jnp.maximum(dist2, 1e-12))
        # Spot falloff (reference: src/emitters/spot.cpp): 1 inside the
        # beam, linear-in-cos rolloff to the cutoff.
        cos_sp = -jnp.sum(scene.pt_dir[sel_pt] * d_pt, axis=-1)
        co = scene.pt_cutoff_cos[sel_pt]
        cb = scene.pt_beam_cos[sel_pt]
        fall = jnp.clip((cos_sp - co) / jnp.maximum(cb - co, 1e-6), 0.0, 1.0)
        fall = jnp.where(kind == 1, fall, 1.0)
        rad_pt = scene.pt_intensity[sel_pt] * (
            inv_r2 * fall
            / (pmf_pt * jnp.maximum(pt_prob * (1.0 - env_prob), 1e-9))
        )[..., None]
        rec_pt = {
            "d": d_pt, "dist": dist, "pdf": jnp.ones(n_rays),
            "radiance": rad_pt, "n": -d_pt,
            # Collimated beams (kind 3) are doubly-delta: direct sampling
            # always fails (reference: collimated.cpp:126 pdfDirect = 0).
            "valid": (is_dir | (dist2 > 1e-12)) & (kind != 3),
            "delta": jnp.ones(n_rays, dtype=bool),
        }
    else:
        pick_pt = jnp.zeros(n_rays, dtype=bool)
        rec_pt = zero

    if m:
        sel = jnp.clip(jnp.searchsorted(scene.em_tri_cdf, u1), 0, m - 1)
        tri = scene.em_tri_idx[sel]
        b = warp.square_to_uniform_triangle(u2)
        y = (
            scene.tri_v0[tri]
            + b[..., 0:1] * scene.tri_e1[tri]
            + b[..., 1:2] * scene.tri_e2[tri]
        )
        n = scene.tri_ng[tri]
        to_y = y - p
        dist2 = jnp.sum(to_y * to_y, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_y / dist[..., None]
        cos_l = -jnp.sum(n * d, axis=-1)
        pdf_area = scene.em_tri_pdf[sel] / jnp.maximum(scene.em_tri_area[sel], 1e-20)
        pdf_sa = pdf_area * dist2 / jnp.maximum(cos_l, 1e-12)
        if n_pt:
            pdf_sa = pdf_sa * (1.0 - scene.pt_select_prob)
        pdf_sa = pdf_sa * (1.0 - env_prob)
        valid = (cos_l > 1e-6) & (dist2 > 1e-12)
        rec_area = {
            "d": d, "dist": dist, "pdf": jnp.where(valid, pdf_sa, 0.0),
            "radiance": scene.emitter_radiance[scene.tri_emitter[tri]],
            "n": n, "valid": valid,
            "delta": jnp.zeros(n_rays, dtype=bool),
        }
    else:
        rec_area = zero
        pick_pt = jnp.ones(n_rays, dtype=bool)

    out = {}
    for k in zero:
        a, b_ = rec_pt[k], rec_area[k]
        if a.ndim > 1:
            out[k] = jnp.where(pick_pt[..., None], a, b_)
            out[k] = jnp.where(pick_env[..., None], rec_env[k], out[k])
        else:
            out[k] = jnp.where(pick_pt, a, b_)
            out[k] = jnp.where(pick_env, rec_env[k], out[k])
    return out


def tri_pdf_over_area(scene):
    """Dense [T] map: triangle → discrete-selection pdf / area (0 if not emissive)."""
    n_tris = scene.tri_v0.shape[0]
    dense = jnp.zeros((n_tris,))
    if scene.em_tri_idx.shape[0]:
        dense = dense.at[scene.em_tri_idx].set(
            scene.em_tri_pdf / jnp.maximum(scene.em_tri_area, 1e-20)
        )
    return dense


def pdf_direct_hit(scene, pdf_over_area_dense, tri, d, dist):
    """Solid-angle NEE pdf of hitting emissive triangle ``tri`` along d at dist."""
    n = scene.tri_ng[jnp.maximum(tri, 0)]
    cos_l = -jnp.sum(n * d, axis=-1)
    pdf_area = pdf_over_area_dense[jnp.maximum(tri, 0)]
    pdf = pdf_area * dist * dist / jnp.maximum(cos_l, 1e-12)
    return jnp.where((tri >= 0) & (cos_l > 1e-6), pdf, 0.0)


def env_eval(scene, d: jnp.ndarray) -> jnp.ndarray:
    """Environment radiance along (missed-ray) directions d [N, 3].

    Constant env (reference: emitters/constant.cpp) or equirectangular
    envmap (reference: emitters/envmap.cpp); env_radiance acts as the
    constant value / the envmap scale.
    """
    if scene.env_map.shape[0] <= 1:
        return jnp.broadcast_to(scene.env_radiance, d.shape)
    dl = jnp.einsum("ji,...j->...i", scene.env_to_world, d)  # world→local
    he, we = scene.env_map.shape[0], scene.env_map.shape[1]
    u = 0.5 + jnp.arctan2(dl[..., 0], -dl[..., 2]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(dl[..., 1], -1.0, 1.0)) / jnp.pi
    x = jnp.clip((u % 1.0) * we, 0.0, we - 1e-3)
    y = jnp.clip(v * he, 0.0, he - 1e-3)
    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, we - 1)
    y1 = jnp.minimum(y0 + 1, he - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c = (
        scene.env_map[y0, x0] * (1 - fx) * (1 - fy)
        + scene.env_map[y0, x1] * fx * (1 - fy)
        + scene.env_map[y1, x0] * (1 - fx) * fy
        + scene.env_map[y1, x1] * fx * fy
    )
    return c * scene.env_radiance


def eval_emitter(scene, interaction, wi_world):
    """Radiance emitted toward wi_world from a hit (front side only)."""
    em = interaction["emitter"]
    rad = scene.emitter_radiance[jnp.maximum(em, 0)]
    front = jnp.sum(interaction["ng"] * wi_world, axis=-1) > 0.0
    return jnp.where(((em >= 0) & front)[..., None], rad, 0.0)
