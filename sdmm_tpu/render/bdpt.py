"""Bidirectional path tracer with full multiple-importance sampling.

TPU-native re-design of the reference's BDPT
(reference: mitsuba/src/integrators/bdpt/{bdpt,bdpt_proc,bdpt_wr}.cpp).
The per-pixel recursive subpath construction becomes two vectorized random
walks producing dense vertex arrays [N, V, ...]; the (s,t) strategy
enumeration is a static Python loop (every index static under jit), each
strategy evaluating its connection and balance-heuristic MIS weight over
the whole wave at once. The t=1 strategies splat into a shared light
image (scatter-add), exactly like the reference's LightImage work result
(bdpt_wr.cpp).

Scope: area emitters drive the light subpaths; environment maps
contribute through s=0 strategies only (weight 1 — no competing
strategy), and delta point/spot/directional lights are not connected
(GAPS.md). Delta BSDFs are handled via their flags in the MIS walk.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdf as bsdf_mod
from ..core import warp
from ..core.frame import coordinate_system, normalize, to_local, to_world
from ..scene import emitters
from ..scene.sensor import generate_rays
from . import intersect as isect
from .ptracer import camera_connect
from .volpath import RAY_EPS, shading_frame


def _convert(pdf_dir, from_p, to_p, to_n):
    """Solid-angle pdf at from_p → area pdf at to_p."""
    d = to_p - from_p
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, 1e-20))
    cos_t = jnp.abs(jnp.sum(to_n * d, axis=-1) / r)
    return pdf_dir * cos_t / jnp.maximum(r2, 1e-20)


def _bsdf_pdf(scene, vtx, i, wi_world, wo_world, types):
    """Scattering pdf at stored vertex i for arbitrary directions."""
    params = bsdf_mod.gather_params(scene, vtx["bsdf"][:, i],
                                    vtx["uv"][:, i], types=types)
    s_ax, t_ax, n_ax = shading_frame(params, vtx["ns"][:, i], wi_world)
    wi = to_local(s_ax, t_ax, n_ax, wi_world)
    wo = to_local(s_ax, t_ax, n_ax, wo_world)
    _, pdf = bsdf_mod.eval_pdf_full(params, wi, wo, types=types)
    return pdf


def _bsdf_f(scene, vtx, i, wi_world, wo_world, types):
    """f·cos at stored vertex i (wi: toward the previous vertex)."""
    params = bsdf_mod.gather_params(scene, vtx["bsdf"][:, i],
                                    vtx["uv"][:, i], types=types)
    s_ax, t_ax, n_ax = shading_frame(params, vtx["ns"][:, i], wi_world)
    wi = to_local(s_ax, t_ax, n_ax, wi_world)
    wo = to_local(s_ax, t_ax, n_ax, wo_world)
    f, _ = bsdf_mod.eval_pdf_full(params, wi, wo, types=types)
    return f


def _walk(scene, key, ro, rd, beta0, pdf_dir0, n_verts, types):
    """Random walk storing vertices 1..n_verts (0 = origin, not stored).

    Returns dict of [N, n_verts, ...]: p, ns, ng, bsdf, uv, beta (throughput
    INCLUDING this vertex's arrival), pdf_fwd (area), pdf_rev (area,
    backfilled one step behind), delta (the bounce that LEFT this vertex
    was delta), valid, emitter (triangle emitter id at the vertex), wi
    (unit, toward the previous vertex).
    """
    n = ro.shape[0]
    recs = []
    beta = beta0
    pdf_dir = pdf_dir0
    active = jnp.ones((n,), bool)
    prev_p = ro
    prev_delta = jnp.zeros((n,), bool)
    for i in range(n_verts):
        k = jax.random.fold_in(key, i)
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        entered = active
        active = active & hit["valid"]
        pdf_fwd = _convert(pdf_dir, prev_p, it["p"], it["ns"])

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        u0 = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
        u1 = jax.random.uniform(k, (n,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=types)
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        # Reverse pdf of re-sampling the PREVIOUS vertex from here.
        _, pdf_rev_dir = bsdf_mod.eval_pdf_full(params, bs["wo"], wi_local,
                                                types=types)
        rec = {
            "p": it["p"], "ns": it["ns"], "ng": it["ng"],
            "bsdf": it["bsdf"], "uv": it["uv"][..., :2], "wi": -rd,
            "beta": beta, "pdf_fwd": pdf_fwd,
            "pdf_rev_dir_to_prev": pdf_rev_dir,
            "prev_p": prev_p,
            "delta": bs["delta"], "prev_delta": prev_delta,
            "vdelta": bsdf_mod.is_delta_only(params),
            "valid": active,
            "miss_env": entered & ~hit["valid"],
            "emitter": jnp.where(hit["valid"], scene.tri_emitter[
                jnp.maximum(hit["tri"], 0)], -1),
            "tri": hit["tri"],
        }
        recs.append(rec)

        beta = beta * bs["weight"]
        active = active & jnp.any(bs["weight"] > 0.0, axis=-1)
        prev_p = it["p"]
        prev_delta = bs["delta"]
        ro = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * wo_world, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        rd = wo_world
        pdf_dir = bs["pdf"]

    out = {k: jnp.stack([r[k] for r in recs], axis=1) for k in recs[0]}
    # Backfill pdf_rev in area measure: vertex i's reverse pdf is the pdf of
    # sampling it from vertex i+1.
    pdf_rev = [jnp.zeros((n,)) for _ in range(n_verts)]
    for i in range(n_verts - 1):
        pdf_rev[i] = _convert(out["pdf_rev_dir_to_prev"][:, i + 1],
                              out["p"][:, i + 1], out["p"][:, i],
                              out["ns"][:, i])
    out["pdf_rev"] = jnp.stack(pdf_rev, axis=1)
    return out


def _remap0(x):
    """Zero pdfs → 1 so delta-segment ratios drop out (PBRT remap0)."""
    return jnp.where(x > 0, x, 1.0)


def _mis_weight(ev, lv, s, t, pt_rev, ptm_rev, qs_rev, qsm_rev):
    """Balance-heuristic weight for strategy (s, t) over the wave.

    Eye vertex j≥1 ↔ ev index j-1 (camera not stored; it is never delta
    and never enters the walk). Light vertex j ↔ lv index j (index 0 is
    the emitter point). pt_rev/ptm_rev/qs_rev/qsm_rev are the
    connection-remapped reverse area pdfs of eye[t-1], eye[t-2],
    light[s-1], light[s-2] (pass None where out of range).
    Follows PBRT's MISWeight, which matches the reference's
    bdpt.cpp pathWeight computation.
    """
    n = ev["p"].shape[0]
    if s + t == 2:
        # Directly visible light: the (1,1) strategy is never executed
        # (PBRT skips it too), so (0,2) carries full weight.
        return jnp.ones((n,))
    sum_ri = jnp.zeros((n,))

    def ev_delta(i):  # vertex-level "BSDF is delta-only" flag
        return ev["vdelta"][:, i - 1]

    ri = jnp.ones((n,))
    for i in range(t - 1, 0, -1):
        rev = pt_rev if i == t - 1 else (ptm_rev if i == t - 2 else
                                         ev["pdf_rev"][:, i - 1])
        fwd = ev["pdf_fwd"][:, i - 1]
        ri = ri * _remap0(rev) / _remap0(fwd)
        d_i = jnp.zeros((n,), bool) if i == t - 1 else ev_delta(i)
        d_prev = ev_delta(i - 1) if i - 1 >= 1 else jnp.zeros((n,), bool)
        sum_ri = sum_ri + jnp.where(d_i | d_prev, 0.0, ri)

    ri = jnp.ones((n,))
    for i in range(s - 1, -1, -1):
        rev = qs_rev if i == s - 1 else (qsm_rev if i == s - 2 else
                                         lv["pdf_rev"][:, i])
        fwd = lv["pdf_fwd"][:, i]
        ri = ri * _remap0(rev) / _remap0(fwd)
        d_i = (jnp.zeros((n,), bool) if i == s - 1
               else lv["vdelta"][:, i])
        d_prev = lv["vdelta"][:, i - 1] if i >= 1 else jnp.zeros((n,), bool)
        sum_ri = sum_ri + jnp.where(d_i | d_prev, 0.0, ri)

    return 1.0 / (1.0 + sum_ri)


def _we_dir(scene, d_world, width, height, fov_axis):
    """Camera direction pdf / importance for unit directions d_world —
    WH/(4·tx·ty·cos³θ) inside the frustum, 0 outside (pixel-uniform film
    sampling; consistent with camera_connect and sensor.generate_rays)."""
    rot = scene.cam_to_world[:3, :3]
    d_cam = d_world @ rot
    z = d_cam[..., 2]
    aspect = width / height
    tan_half = scene.cam_tan_half_fov
    if fov_axis == "x":
        tx, ty = tan_half, tan_half / aspect
    else:
        tx, ty = tan_half * aspect, tan_half
    sx = d_cam[..., 0] / jnp.maximum(z, 1e-12) / tx
    sy = d_cam[..., 1] / jnp.maximum(z, 1e-12) / ty
    inside = (z > 1e-6) & (jnp.abs(sx) <= 1.0) & (jnp.abs(sy) <= 1.0)
    we = (width * height) / (4.0 * tx * ty * jnp.maximum(z, 1e-6) ** 3)
    return jnp.where(inside, we, 0.0)


def _sample_light_origin(scene, key, n):
    """Area-emitter start vertex for light subpaths: position (area pdf
    folded with triangle selection) + cosine emission direction."""
    k1, k2, k3 = jax.random.split(key, 3)
    m = scene.em_tri_idx.shape[0]
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n, 2))
    u3 = jax.random.uniform(k3, (n, 2))
    sel = jnp.clip(jnp.searchsorted(scene.em_tri_cdf, u1), 0, max(m - 1, 0))
    tri = scene.em_tri_idx[sel]
    b = warp.square_to_uniform_triangle(u2)
    p = (scene.tri_v0[tri] + b[..., 0:1] * scene.tri_e1[tri]
         + b[..., 1:2] * scene.tri_e2[tri])
    nrm = scene.tri_ng[tri]
    pdf_pos = scene.em_tri_pdf[sel] / jnp.maximum(scene.em_tri_area[sel],
                                                  1e-20)
    le = scene.emitter_radiance[scene.tri_emitter[tri]]
    d_local = warp.square_to_cosine_hemisphere(u3)
    s_ax, t_ax = coordinate_system(nrm)
    d = to_world(s_ax, t_ax, nrm, d_local)
    cos_e = jnp.maximum(d_local[..., 2], 0.0)
    pdf_dir = cos_e / jnp.pi
    return {
        "p": p, "n": nrm, "d": d, "Le": le, "pdf_pos": pdf_pos,
        "pdf_dir": pdf_dir, "valid": jnp.full((n,), m > 0),
    }


def _prepend_light_origin(l0, lw, n_light_surf):
    """Light-vertex arrays with the emitter point as index 0."""
    n = l0["p"].shape[0]
    lv = {}
    lv["p"] = jnp.concatenate([l0["p"][:, None], lw["p"]], axis=1)
    lv["ns"] = jnp.concatenate([l0["n"][:, None], lw["ns"]], axis=1)
    lv["ng"] = jnp.concatenate([l0["n"][:, None], lw["ng"]], axis=1)
    lv["beta"] = jnp.concatenate(
        [l0["Le"][:, None] / jnp.maximum(l0["pdf_pos"], 1e-20)[:, None, None],
         lw["beta"]], axis=1)
    lv["pdf_fwd"] = jnp.concatenate([l0["pdf_pos"][:, None],
                                     lw["pdf_fwd"]], axis=1)
    # Emitter vertex reverse pdf: sampled back from light vertex 1.
    if n_light_surf > 0:
        rev0 = _convert(lw["pdf_rev_dir_to_prev"][:, 0], lw["p"][:, 0],
                        l0["p"], l0["n"])
    else:
        rev0 = jnp.zeros((n,))
    lv["pdf_rev"] = jnp.concatenate([rev0[:, None], lw["pdf_rev"]], axis=1)
    lv["vdelta"] = jnp.concatenate(
        [jnp.zeros((n, 1), bool), lw["vdelta"]], axis=1)
    lv["valid"] = jnp.concatenate([l0["valid"][:, None], lw["valid"]],
                                  axis=1)
    lv["wi"] = jnp.concatenate([l0["d"][:, None] * 0, lw["wi"]], axis=1)
    lv["bsdf"] = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), lw["bsdf"]], axis=1)
    lv["uv"] = jnp.concatenate([jnp.zeros((n, 1, 2)), lw["uv"]], axis=1)
    lv["prev_p"] = jnp.concatenate([l0["p"][:, None] * 0, lw["prev_p"]],
                                   axis=1)
    return lv


def _vis(scene, a, a_ng, b_p):
    """Mutual visibility a→b with normal-offset origins."""
    d = b_p - a
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20))
    dn = d / r[:, None]
    o = a + a_ng * jnp.where(jnp.sum(a_ng * dn, axis=-1) > 0,
                             RAY_EPS, -RAY_EPS)[:, None]
    occ = isect.occluded(scene, o, dn, r * (1.0 - 1e-3))
    return ~occ, dn, r


@partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                   "bsdf_types", "fov_axis"))
def trace_bdpt(scene, key, pix_xy, width: int, height: int,
               max_depth: int = 6, bsdf_types: tuple | None = None,
               fov_axis: str = "x"):
    """All BDPT strategies for one wave of pixel samples.

    Returns (li [N,3] — the t≥2 strategies, owned by the sample's pixel;
    splat_film [n_pix,3] — the t=1 light-tracing strategies, normalized by
    the caller over all light subpaths).
    """
    n = pix_xy.shape[0]
    types = bsdf_types
    k_e, k_l, k_s = jax.random.split(key, 3)

    # --- Eye subpath (camera = vertex 0, surface vertices 1..max_depth).
    ro, rd = generate_rays(scene, pix_xy, width, height, fov_axis)
    we0 = _we_dir(scene, rd, width, height, fov_axis)
    ev = _walk(scene, k_e, ro, rd, jnp.ones((n, 3)), we0, max_depth, types)
    cam_p = jnp.broadcast_to(scene.cam_to_world[:3, 3], (n, 3))

    # --- Light subpath (emitter point = vertex 0, surfaces 1..max_depth-1).
    l0 = _sample_light_origin(scene, k_l, n)
    n_light_surf = max_depth - 1
    beta1 = l0["Le"] * (jnp.pi / jnp.maximum(l0["pdf_pos"], 1e-20))[:, None]
    lw = _walk(scene, jax.random.fold_in(k_l, 1),
               l0["p"] + l0["n"] * RAY_EPS, l0["d"], beta1, l0["pdf_dir"],
               n_light_surf, types)
    lv = _prepend_light_origin(l0, lw, n_light_surf)
    pdf_over_area = emitters.tri_pdf_over_area(scene)

    li = jnp.zeros((n, 3))
    splat = jnp.zeros((width * height, 3))

    # ---- s = 0 strategies (eye path alone; also env on miss, weight 1).
    for t in range(2, max_depth + 2):
        i = t - 2  # ev index of eye vertex t-1
        # Environment hit: no competing strategy (light walks never start
        # at infinity here) → weight 1.
        li = li + jnp.where(ev["miss_env"][:, i][:, None],
                            ev["beta"][:, i]
                            * emitters.env_eval(scene, -ev["wi"][:, i]), 0.0)
        em_id = ev["emitter"][:, i]
        on_em = ev["valid"][:, i] & (em_id >= 0)
        front = jnp.sum(ev["ns"][:, i] * ev["wi"][:, i], axis=-1) > 0
        le = scene.emitter_radiance[jnp.maximum(em_id, 0)]
        c = ev["beta"][:, i] * le
        # MIS: the emitter point could have been the light-path origin
        # (pt_rev = its position pdf) emitting toward the previous vertex
        # (ptm_rev).
        pt_rev = pdf_over_area[jnp.maximum(ev["tri"][:, i], 0)]
        d_back = ev["wi"][:, i]
        cos_e = jnp.maximum(jnp.sum(ev["ns"][:, i] * d_back, axis=-1), 0.0)
        if i >= 1:
            ptm_rev = _convert(cos_e / jnp.pi, ev["p"][:, i],
                               ev["prev_p"][:, i], ev["ns"][:, i - 1])
        else:
            # Previous vertex is the camera; its "normal" never enters the
            # walk (loop floor), value unused.
            ptm_rev = jnp.zeros((n,))
        w = _mis_weight(ev, lv, 0, t, pt_rev, ptm_rev, None, None)
        li = li + jnp.where((on_em & front)[:, None], c * w[:, None], 0.0)

    # ---- s = 1 strategies (fresh emitter sample → eye vertex t-1).
    m_em = scene.em_tri_idx.shape[0]
    if m_em > 0:
        for t in range(2, max_depth + 1):
            i = t - 2
            k_t = jax.random.fold_in(k_s, 100 + t)
            y = _sample_light_origin(scene, k_t, n)
            ok, d_xy, r = _vis(scene, ev["p"][:, i], ev["ng"][:, i],
                               y["p"])  # d_xy: eye → light
            cos_y = jnp.maximum(jnp.sum(y["n"] * -d_xy, axis=-1), 0.0)
            f_pt = _bsdf_f(scene, ev, i, ev["wi"][:, i], d_xy, types)
            c = (ev["beta"][:, i] * f_pt * y["Le"]
                 * (cos_y / jnp.maximum(y["pdf_pos"], 1e-20)
                    / jnp.maximum(r * r, 1e-20))[:, None])
            good = (ev["valid"][:, i] & y["valid"] & ok & (cos_y > 0)
                    & jnp.any(c > 0, axis=-1))
            # MIS remaps.
            qs_rev = _convert(
                _bsdf_pdf(scene, ev, i, ev["wi"][:, i], d_xy, types),
                ev["p"][:, i], y["p"], y["n"])
            pt_rev = _convert(cos_y / jnp.pi, y["p"], ev["p"][:, i],
                              ev["ns"][:, i])
            if i >= 1:
                ptm_rev = _convert(
                    _bsdf_pdf(scene, ev, i, d_xy, ev["wi"][:, i], types),
                    ev["p"][:, i], ev["prev_p"][:, i], ev["ns"][:, i - 1])
            else:
                ptm_rev = jnp.zeros((n,))
            lv1 = {
                "pdf_fwd": y["pdf_pos"][:, None],
                "pdf_rev": jnp.zeros((n, 1)),
                "vdelta": jnp.zeros((n, 1), bool),
                "p": y["p"][:, None],
            }
            w = _mis_weight(ev, lv1, 1, t, pt_rev, ptm_rev, qs_rev, None)
            li = li + jnp.where(good[:, None], c * w[:, None], 0.0)

    # ---- t = 1 strategies (light vertex → camera splat).
    for s in range(2, max_depth + 1):
        j = s - 1  # lv index of light vertex s-1 (surface)
        cc = camera_connect(scene, lv["p"][:, j], width, height, fov_axis)
        ok, _, _ = _vis(scene, lv["p"][:, j], lv["ng"][:, j], cam_p)
        f_qs = _bsdf_f(scene, lv, j, lv["wi"][:, j], cc["d"], types)
        c = lv["beta"][:, j] * f_qs * cc["we"][:, None]
        good = lv["valid"][:, j] & cc["valid"] & ok & jnp.any(c > 0, axis=-1)
        # MIS remaps: camera re-samples qs (qs_rev), qs re-samples its
        # predecessor given the camera direction (qsm_rev).
        we_q = _we_dir(scene, -cc["d"], width, height, fov_axis)
        qs_rev = _convert(we_q, cam_p, lv["p"][:, j], lv["ns"][:, j])
        qsm_rev = _convert(
            _bsdf_pdf(scene, lv, j, cc["d"], lv["wi"][:, j], types),
            lv["p"][:, j], lv["prev_p"][:, j],
            lv["ns"][:, j - 1])
        w = _mis_weight(ev, lv, s, 1, None, None, qs_rev, qsm_rev)
        splat = splat.at[cc["pix"]].add(
            jnp.where(good[:, None], c * w[:, None], 0.0))

    # ---- s ≥ 2, t ≥ 2 connections.
    for t in range(2, max_depth + 1):
        for s in range(2, max_depth + 1):
            if s + t - 1 > max_depth:
                continue
            i = t - 2
            j = s - 1
            ok, d_pq, r = _vis(scene, ev["p"][:, i], ev["ng"][:, i],
                               lv["p"][:, j])  # eye → light direction
            f_pt = _bsdf_f(scene, ev, i, ev["wi"][:, i], d_pq, types)
            f_qs = _bsdf_f(scene, lv, j, lv["wi"][:, j], -d_pq, types)
            c = (ev["beta"][:, i] * f_pt * f_qs * lv["beta"][:, j]
                 / jnp.maximum(r * r, 1e-20)[:, None])
            good = (ev["valid"][:, i] & lv["valid"][:, j] & ok
                    & jnp.any(c > 0, axis=-1))
            qs_rev = _convert(
                _bsdf_pdf(scene, ev, i, ev["wi"][:, i], d_pq, types),
                ev["p"][:, i], lv["p"][:, j], lv["ns"][:, j])
            pt_rev = _convert(
                _bsdf_pdf(scene, lv, j, lv["wi"][:, j], -d_pq, types),
                lv["p"][:, j], ev["p"][:, i], ev["ns"][:, i])
            qsm_rev = _convert(
                _bsdf_pdf(scene, lv, j, -d_pq, lv["wi"][:, j], types),
                lv["p"][:, j], lv["prev_p"][:, j], lv["ns"][:, j - 1])
            if i >= 1:
                ptm_rev = _convert(
                    _bsdf_pdf(scene, ev, i, d_pq, ev["wi"][:, i], types),
                    ev["p"][:, i], ev["prev_p"][:, i], ev["ns"][:, i - 1])
            else:
                ptm_rev = jnp.zeros((n,))
            w = _mis_weight(ev, lv, s, t, pt_rev, ptm_rev, qs_rev, qsm_rev)
            li = li + jnp.where(good[:, None], c * w[:, None], 0.0)

    li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
    splat = jnp.nan_to_num(splat, nan=0.0, posinf=0.0, neginf=0.0)
    return li, splat


def render_bdpt(scene, cfg, spp: int = 8, seed: int = 1234,
                rays_per_wave: int = 1 << 15):
    """BDPT render driver: per-pixel strategies averaged like the camera
    tracer, light-tracing splats normalized by the total light-subpath
    count and added (reference: bdpt_wr.cpp LightImage accumulation)."""
    w, h = cfg.width, cfg.height
    n_pix = w * h
    depth = min(cfg.max_depth, 8)
    eye_film = jnp.zeros((n_pix, 3))
    weight = jnp.zeros((n_pix,))
    splat_film = jnp.zeros((n_pix, 3))
    key = jax.random.PRNGKey(seed)

    wave = min(rays_per_wave, n_pix)
    n_waves = (n_pix + wave - 1) // wave
    pix = np.arange(n_waves * wave, dtype=np.int32) % n_pix

    @jax.jit
    def run(eye_film, weight, splat_film, key, pixel_idx):
        u = jax.random.uniform(key, (pixel_idx.shape[0], 2))
        px = (pixel_idx % w).astype(jnp.float32) + u[:, 0]
        py = (pixel_idx // w).astype(jnp.float32) + u[:, 1]
        li, sp = trace_bdpt(
            scene, jax.random.fold_in(key, 1),
            jnp.stack([px, py], -1), w, h, max_depth=depth,
            bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
        )
        eye_film = eye_film.at[pixel_idx].add(li)
        weight = weight.at[pixel_idx].add(1.0)
        return eye_film, weight, splat_film + sp

    for s in range(spp):
        for wv in range(n_waves):
            k = jax.random.fold_in(jax.random.fold_in(key, s), wv)
            idx = jnp.asarray(pix[wv * wave: (wv + 1) * wave])
            eye_film, weight, splat_film = run(
                eye_film, weight, splat_film, k, idx
            )
    # Splat normalization: film_j += C·We/r² per light subpath, divided by
    # the total subpath count (same convention validated in render_ptracer).
    total_light_paths = spp * n_waves * wave
    img = (np.asarray(eye_film) / np.maximum(np.asarray(weight), 1.0)[:, None]
           + np.asarray(splat_film) / total_light_paths)
    return {"image": img.reshape(h, w, 3)}
