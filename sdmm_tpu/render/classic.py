"""Classic single-bounce / utility integrators: direct, ao, field, multichannel.

TPU-native wavefront equivalents of the reference's small integrator plugins
(reference: mitsuba/src/integrators/direct/direct.cpp,
mitsuba/src/integrators/direct/ao.cpp, mitsuba/src/integrators/misc/field.cpp,
mitsuba/src/integrators/misc/multichannel.cpp). Each is a trace function over
a flat ray wave, pluggable into render.renderer.render via ``trace_fn``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdf as bsdf_mod
from ..core.frame import to_local, to_world
from ..scene import emitters
from . import intersect as isect
from .volpath import RAY_EPS, mi_weight, shading_frame


@partial(
    jax.jit,
    static_argnames=("emitter_samples", "bsdf_samples", "bsdf_types", "has_bump"),
)
def trace_direct(
    scene,
    key,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    emitter_samples: int = 1,
    bsdf_samples: int = 1,
    bsdf_types: tuple | None = None,
    has_bump: bool = False,
):
    """Direct illumination with multi-sample MIS.

    Mirrors the reference's ``direct`` integrator: ``emitterSamples`` light
    samples and ``bsdfSamples`` BSDF samples per shading point, each
    MIS-weighted with fractional weights 1/m, 1/n folded into the heuristic
    (reference: direct.cpp Li(), m_weightLum/m_weightBSDF).
    """
    n = ro.shape[0]
    pdf_over_area = emitters.tri_pdf_over_area(scene)

    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    if has_bump:
        it["ns"] = isect.apply_bumpmap(scene, it)

    li = jnp.zeros((n, 3))
    # Visible emitters and the environment contribute directly.
    li = li + jnp.where(
        hit["valid"][:, None], emitters.eval_emitter(scene, it, -rd), 0.0
    )
    li = li + jnp.where(~hit["valid"][:, None], emitters.env_eval(scene, rd), 0.0)

    params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
    s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
    wi_local = to_local(s_ax, t_ax, n_ax, -rd)
    smooth = bsdf_mod.has_smooth(params)
    on_surface = hit["valid"] & smooth

    w_lum = 1.0 / max(emitter_samples, 1)
    w_bsdf = 1.0 / max(bsdf_samples, 1)

    # --- Emitter sampling strategy ---
    for i in range(emitter_samples):
        k = jax.random.fold_in(key, i)
        u1 = jax.random.uniform(k, (n,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
        ls = emitters.sample_direct(scene, it["p"], u1, u2)
        wo_l = to_local(s_ax, t_ax, n_ax, ls["d"])
        f, pdf_b = bsdf_mod.eval_pdf_full(params, wi_local, wo_l, types=bsdf_types)
        cand = on_surface & ls["valid"] & (ls["pdf"] > 0.0)
        shadow_o = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * ls["d"], axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        occ = isect.occluded(scene, shadow_o, ls["d"], ls["dist"] * (1.0 - 1e-3))
        w = jnp.where(
            ls["delta"], 1.0, mi_weight(ls["pdf"] * w_lum, pdf_b * w_bsdf)
        )
        contrib = f * ls["radiance"] * (w / jnp.maximum(ls["pdf"], 1e-20))[:, None]
        li = li + jnp.where((cand & ~occ)[:, None], contrib * w_lum, 0.0)

    # --- BSDF sampling strategy ---
    for i in range(bsdf_samples):
        k = jax.random.fold_in(key, 1000 + i)
        u0 = jax.random.uniform(k, (n,))
        u1 = jax.random.uniform(jax.random.fold_in(k, 1), (n,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 2), (n, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        good = hit["valid"] & jnp.any(bs["weight"] > 0.0, axis=-1)
        o2 = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * wo_world, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        hit2 = isect.intersect(scene, o2, wo_world)
        it2 = isect.surface_interaction(scene, o2, wo_world, hit2)
        le2 = emitters.eval_emitter(scene, it2, -wo_world)
        pdf_nee = emitters.pdf_direct_hit(
            scene, pdf_over_area, hit2["tri"], wo_world, hit2["t"]
        )
        w = jnp.where(
            bs["delta"], 1.0, mi_weight(bs["pdf"] * w_bsdf, pdf_nee * w_lum)
        )
        li = li + jnp.where(
            (good & hit2["valid"])[:, None], bs["weight"] * le2 * w[:, None] * w_bsdf, 0.0
        )
        # Environment on miss.
        if scene.env_pdf.shape[0] > 1:
            pdf_env = emitters.pdf_env_dir(scene, wo_world) * scene.env_select_prob
            w_env = jnp.where(bs["delta"], 1.0, mi_weight(bs["pdf"] * w_bsdf, pdf_env * w_lum))
        else:
            w_env = jnp.ones(n)
        li = li + jnp.where(
            (good & ~hit2["valid"])[:, None],
            bs["weight"] * emitters.env_eval(scene, wo_world) * w_env[:, None] * w_bsdf,
            0.0,
        )
    return li


@partial(jax.jit, static_argnames=("shading_samples", "ray_length"))
def trace_ao(
    scene,
    key,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    ray_length: float = -1.0,
    shading_samples: int = 1,
):
    """Ambient occlusion (reference: direct/ao.cpp).

    rayLength < 0 → half the scene bounding-sphere radius, as the reference
    (ao.cpp:77-79). Cosine-weighted hemisphere sampling means the estimator
    is simply the fraction of unoccluded rays.
    """
    n = ro.shape[0]
    if ray_length < 0:
        radius = 0.5 * jnp.linalg.norm(scene.aabb_hi - scene.aabb_lo) * 0.5
    else:
        radius = jnp.asarray(ray_length)
    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    from ..core import warp
    from ..core.frame import coordinate_system

    # Frame aligned to the shading normal flipped toward the viewer.
    cos_i = jnp.sum(it["ns"] * -rd, axis=-1)
    nrm = jnp.where(cos_i[:, None] < 0, -it["ns"], it["ns"])
    s_ax, t_ax = coordinate_system(nrm)
    acc = jnp.zeros((n,))
    for i in range(shading_samples):
        u2 = jax.random.uniform(jax.random.fold_in(key, i), (n, 2))
        d_local = warp.square_to_cosine_hemisphere(u2)
        d = to_world(s_ax, t_ax, nrm, d_local)
        o = it["p"] + nrm * RAY_EPS
        occ = isect.occluded(scene, o, d, jnp.full((n,), radius))
        acc = acc + jnp.where(hit["valid"] & ~occ, 1.0, 0.0)
    val = acc / shading_samples
    return jnp.broadcast_to(val[:, None], (n, 3))


FIELDS = (
    "position", "relPosition", "distance", "geoNormal", "shNormal",
    "uv", "albedo", "shapeIndex", "primIndex",
)


@partial(jax.jit, static_argnames=("field", "bsdf_types"))
def trace_field(scene, key, ro, rd, field: str = "shNormal",
                bsdf_types: tuple | None = None):
    """AOV extraction (reference: misc/field.cpp) — one intersection, no MC."""
    n = ro.shape[0]
    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    if field == "position":
        val = it["p"]
    elif field == "relPosition":
        # Camera-space position (reference: its.p transformed by worldToCamera).
        rot = scene.cam_to_world[:3, :3]
        val = (it["p"] - scene.cam_to_world[:3, 3]) @ rot  # R^T (p - o)
    elif field == "distance":
        val = jnp.broadcast_to(hit["t"][:, None], (n, 3))
    elif field == "geoNormal":
        val = it["ng"]
    elif field == "shNormal":
        val = it["ns"]
    elif field == "uv":
        val = jnp.concatenate([it["uv"], jnp.zeros((n, 1))], axis=-1)
    elif field == "albedo":
        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
        val = params["albedo"]
    elif field == "shapeIndex" or field == "primIndex":
        # Flat-triangle scenes: both report the triangle id.
        val = jnp.broadcast_to(hit["tri"].astype(jnp.float32)[:, None], (n, 3))
    else:
        raise ValueError(f"unknown field {field!r} (one of {FIELDS})")
    return jnp.where(hit["valid"][:, None], val, 0.0)


def render_multichannel(scene, cfg, fields=("position", "shNormal", "albedo",
                                            "distance"), spp: int = 4,
                        seed: int = 1234):
    """Render several AOV channels in one pass over the camera rays
    (reference: misc/multichannel.cpp composes child integrators into one
    multi-channel EXR). Returns {name: [H,W,3]}.
    """
    from .renderer import render

    out = {}
    for f in fields:
        res = render(
            scene, cfg, spp=spp, seed=seed,
            trace_fn=lambda scene, key, ro, rd, _f=f: trace_field(
                scene, key, ro, rd, field=_f, bsdf_types=cfg.bsdf_types or None
            ),
        )
        out[f] = res["image"]
    return out


def render_adaptive(scene, cfg, max_spp: int = 64, seed: int = 1234,
                    pass_spp: int = 4, max_error: float = 0.05,
                    p_value: float = 0.05, nee: bool = True,
                    rays_per_wave: int = 1 << 16):
    """Adaptive sampling meta-integrator (reference: misc/adaptive.cpp).

    The reference stops per-block when a t-test bounds the relative error
    below maxError; here the stopping is per-pixel: render in passes of
    ``pass_spp``, and after each pass drop pixels whose relative standard
    error of the mean is below ``max_error`` (same early-stopping bias
    trade as the reference). Returns dict(image, spp_map).
    """
    from ..core.sampler import camera_jitter  # noqa: F401 (parity w/ render)
    from ..scene.sensor import generate_rays
    from .volpath import trace_wave

    w, h = cfg.width, cfg.height
    n_pix = w * h
    img = np.zeros((n_pix, 3))
    sqr = np.zeros((n_pix, 3))
    cnt = np.zeros((n_pix,))
    key = jax.random.PRNGKey(seed)

    @partial(jax.jit, static_argnames=())
    def run_wave(key, pixel_idx):
        u = jax.random.uniform(key, (pixel_idx.shape[0], 2))
        px = (pixel_idx % w).astype(jnp.float32) + u[:, 0]
        py = (pixel_idx // w).astype(jnp.float32) + u[:, 1]
        ro, rd = generate_rays(scene, jnp.stack([px, py], -1), w, h,
                               cfg.fov_axis)
        li = trace_wave(
            scene, jax.random.fold_in(key, 1), ro, rd,
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth, nee=nee,
            bsdf_types=cfg.bsdf_types or None, has_medium=cfg.has_medium,
            has_hetero=cfg.has_hetero, has_bump=cfg.has_bump,
        )
        return jnp.nan_to_num(li)

    active = np.arange(n_pix, dtype=np.int32)
    spp_done = 0
    while spp_done < max_spp and active.size:
        wave = min(rays_per_wave, max(active.size, 1))
        n_waves = (active.size + wave - 1) // wave
        padded = np.resize(active, n_waves * wave)
        for s in range(pass_spp):
            for wv in range(n_waves):
                k = jax.random.fold_in(
                    jax.random.fold_in(key, spp_done + s), wv)
                idx = padded[wv * wave:(wv + 1) * wave]
                li = np.asarray(run_wave(k, jnp.asarray(idx)))
                np.add.at(img, idx, li)
                np.add.at(sqr, idx, li * li)
                np.add.at(cnt, idx, 1.0)
        spp_done += pass_spp
        mean = img / np.maximum(cnt, 1.0)[:, None]
        var = np.maximum(sqr / np.maximum(cnt, 1.0)[:, None] - mean**2, 0.0)
        sem = np.sqrt(var.mean(-1) / np.maximum(cnt, 1.0))
        rel = sem / np.maximum(mean.mean(-1), 1e-3)
        active = np.where(rel > max_error)[0].astype(np.int32)

    image = (img / np.maximum(cnt, 1.0)[:, None]).reshape(h, w, 3)
    return {"image": image, "spp_map": cnt.reshape(h, w)}


def _project(scene, p, width: int, height: int, fov_axis: str = "x"):
    """World point -> fractional pixel coords through the perspective
    sensor (inverse of sensor.generate_rays)."""
    rot = scene.cam_to_world[:3, :3]
    org = scene.cam_to_world[:3, 3]
    v = jnp.einsum("ji,...j->...i", rot, p - org)  # camera space
    z = jnp.maximum(v[..., 2], 1e-6)
    aspect = width / height
    tan_half = scene.cam_tan_half_fov
    if fov_axis == "x":
        tx, ty = tan_half, tan_half / aspect
    else:
        ty, tx = tan_half, tan_half * aspect
    sx = v[..., 0] / (z * tx)
    sy = v[..., 1] / (z * ty)
    px = (1.0 - sx) * 0.5 * width
    py = (1.0 - sy) * 0.5 * height
    return px, py, v[..., 2] > 0


@partial(jax.jit, static_argnames=("width", "height", "fov_axis"))
def trace_motion(scene, key, ro, rd, width: int, height: int,
                 time: float = 1.0, fov_axis: str = "x"):
    """Screen-space motion vectors for the first hit
    (reference: mitsuba/src/integrators/misc/motion.cpp, 'd' config —
    the hit point re-evaluated at ``time`` via the shape's keyframed
    toWorld, both positions projected through the sensor; the output
    pixel stores (dx, dy, 0)).

    Keyframe interpolation is a linear matrix blend of the two frames
    (exact for the translation-only animations in the test suite; the
    reference slerps rotations — noted simplification).
    """
    del key
    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    p0 = it["p"]
    mot = scene.tri_mot[it["tri"]]
    has_mot = hit["valid"] & (mot >= 0)
    mi = jnp.maximum(mot, 0)
    t = jnp.float32(time)
    m_t = scene.mot_m0[mi] * (1.0 - t) + scene.mot_m1[mi] * t
    # p1 = M(t) * M0^{-1} * p0 (geometry is baked at keyframe 0).
    m0_inv = jnp.linalg.inv(scene.mot_m0[mi])
    adv = jnp.einsum("...ij,...jk->...ik", m_t, m0_inv)
    p0_h = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], axis=-1)
    p1 = jnp.einsum("...ij,...j->...i", adv, p0_h)[..., :3]
    p1 = jnp.where(has_mot[:, None], p1, p0)

    x0, y0, ok0 = _project(scene, p0, width, height, fov_axis)
    x1, y1, ok1 = _project(scene, p1, width, height, fov_axis)
    ok = hit["valid"] & ok0 & ok1
    dx = jnp.where(ok, x1 - x0, 0.0)
    dy = jnp.where(ok, y1 - y0, 0.0)
    return jnp.stack([dx, dy, jnp.zeros_like(dx)], axis=-1)
