"""Path-space Metropolis light transport (Veach MLT).

TPU-native re-design of the reference's MLT integrator
(reference: mitsuba/src/integrators/mlt/mlt.cpp + mlt_proc.cpp, mutators
mitsuba/src/libbidir/{mut_lens.cpp,mut_caustic.cpp}). Unlike pssmlt.py's
primary-sample-space restatement, this module mutates EXPLICIT transport
paths: tens of thousands of chains hold their vertex arrays in SoA form
and advance in lockstep; specular-chain re-traces are vectorized
intersection sweeps over all chains at once.

Paths are eye-ordered (e0 = camera, e1..e_len with e_len on an emitter)
— the unidirectional subspace, matching the reference's guided tracer
which compiles NEE out. In the screen parameterization (s, e2..e_len)
with e1 = raycast(s), the pinhole camera factors cancel and the target is

    pi(s, e2..) ∝ lum[ f1·G(e1,e2)·f2·G(e2,e3)···f_{len-1}·
                       G(e_{len-1},e_len)·Le ].

Mutations (each chain picks one per step):

- Large step: an independent path-traced proposal. T(x→y) = p_PT(y), so
  the acceptance is min(1, W_y/W_x) with W the PT luminance estimate —
  the ergodicity role of the reference's bidirectional mutation.
- Lens perturbation (mut_lens.cpp:72-175): screen offset with
  exponentially distributed radius r = r2·exp(log(r1/r2)·U) (:85-87);
  re-trace through the eye-side delta chain to the first connectable
  vertex e_j, reconnect to e_{j+1} (suitability :60-69). The symmetric
  screen kernel cancels; after the deterministic-chain Jacobians cancel
  against the area-measure G factors, the acceptance is the luminance
  ratio of
      respan = Π_{i<j}[w_i·cos(ns_i, ω_out)] · f_j · G(e_j, e_{j+1}) ·
               fac_{j+1}
  (the role of the reference's Q, mut_lens.cpp:177-204).
- Caustic perturbation (mut_caustic.cpp:62-177): cone-perturb the
  outgoing direction at the last connectable vertex e_m before the
  delta chain that ends at the camera-visible vertex e_1, with Veach's
  p.354 heuristic angle scaling (:94-101); propagate to a new e_1' and
  reproject onto the film. The cone density (:197) is evaluated at the
  same angle both ways and cancels; the film reprojection contributes
  the d²·cos³θ_cam/cos(ns_1, ω_cam) screen Jacobian.

Chain-Jacobian/G cancellation is exact on flat specular geometry; curved
specular surfaces would need the reference's per-vertex differential
terms (manifold machinery) and are approximated.

Known detailed-balance deviations (documented so parity debugging does
not rediscover them):
- Curved-specular chains use the flat-geometry Jacobian approximation
  above (measured by the sphere-caustic parity test, tests/test_mlt.py).
- Lens/caustic acceptances are additionally gated by
  ``a = where(recomputed PT weight > 0, a, 0)``: a proposal whose
  re-traced path-tracer luminance underflows is rejected even when the
  respan luminance ratio is positive. This clamp keeps the stored chain
  state consistent with its recomputed weight (the chain's W enters
  later large-step acceptances) at the cost of a small detailed-balance
  deviation for near-black proposals.

Cost note: every chain computes all three mutation proposals per step
(one full PT re-trace + two respans + two weight recomputations) and
keeps one — a deliberate lockstep-SIMD trade: partitioning chains by
mutation pick would turn one dense wave into three ragged ones (mask
occupancy loss + 3x dispatch) for ~2x less arithmetic; on TPU the dense
variant measured faster at protocol chain counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdf as bsdf_mod
from ..bsdf.fresnel import fresnel_conductor, fresnel_dielectric
from ..core.frame import to_local
from ..scene import emitters
from ..scene.scene import BSDF_CONDUCTOR, BSDF_DIELECTRIC
from ..scene.sensor import generate_rays
from . import intersect as isect
from .volpath import RAY_EPS, shading_frame

P_LARGE = 0.4  # mutation mix (reference mlt_proc.cpp picks uniformly
P_LENS = 0.3   # among suitable mutators)

LENS_R1 = 0.1     # pixels (reference mlt.cpp:88 minJump)
LENS_AREA = 0.05  # covered film-area fraction (mlt.cpp:88 coveredArea)
CAUSTIC_R1 = 0.1  # pixels -> radians via per-pixel angle
CAUSTIC_R2 = 50.0  # (mut_caustic.cpp:44-47)


def _lum(rgb):
    return (0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1]
            + 0.072169 * rgb[..., 2])


def _norm(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(
        jnp.sum(v * v, axis=-1, keepdims=True), eps))


def empty_paths(n, d):
    return {
        "pos": jnp.zeros((n, d, 3)),
        "ns": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, d, 1)),
        "ng": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, d, 1)),
        "uv": jnp.zeros((n, d, 2)),
        "bsdf": jnp.zeros((n, d), jnp.int32),
        "delta": jnp.zeros((n, d), bool),
        "emitter": jnp.full((n, d), -1, jnp.int32),
        "length": jnp.zeros((n,), jnp.int32),
        "spos": jnp.zeros((n, 2)),
        "valid": jnp.zeros((n,), bool),
        "rgb": jnp.zeros((n, 3)),  # contribution color (for splatting)
        "wlum": jnp.zeros((n,)),  # PT estimate W (large-step weight)
    }


def trace_path_record(scene, key, spos, width, height, max_depth,
                      bsdf_types, fov_axis):
    """Path-trace from screen positions recording explicit vertices.

    Returns a path dict; `wlum` holds the PT luminance estimate f/p."""
    n = spos.shape[0]
    ro, rd = generate_rays(scene, spos, width, height, fov_axis)
    path = empty_paths(n, max_depth)
    path["spos"] = spos

    def body(carry, k):
        ro, rd, thr, active, path_done, w_out = carry
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        le = emitters.eval_emitter(scene, it, -rd)
        hit_emitter = jnp.any(le > 0.0, axis=-1) & hit["valid"]
        done_now = active & hit_emitter
        w_out = jnp.where(done_now[:, None], thr * le, w_out)
        path_done = path_done | done_now

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        active = active & hit["valid"] & ~done_now

        k1, k2, k3 = jax.random.split(k, 3)
        u0 = jax.random.uniform(k1, (n,))
        u1 = jax.random.uniform(k2, (n,))
        u2 = jax.random.uniform(k3, (n, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2,
                                  types=bsdf_types)
        from ..core.frame import to_world

        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        ok = jnp.any(bs["weight"] > 0.0, axis=-1)
        thr = thr * jnp.where((active & ok)[:, None], bs["weight"], 1.0)
        active = active & ok
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ro2 = it["p"] + it["ng"] * jnp.where(
            wo_dot_geo > 0, RAY_EPS, -RAY_EPS)[:, None]
        rec = {
            "pos": it["p"], "ns": it["ns"], "ng": it["ng"],
            # Fixed-width path buffers store plain (u, v) only; mesh-attr
            # texture channels (widened uv rows) don't survive mutation.
            "uv": it["uv"][..., :2],
            "bsdf": it["bsdf"], "delta": bs["delta"],
            "emitter": it["emitter"],
            "done_now": done_now,
        }
        return (ro2, wo_world, thr, active, path_done, w_out), rec

    keys = jax.random.split(key, max_depth)
    init = (ro, rd, jnp.ones((n, 3)), jnp.ones((n,), bool),
            jnp.zeros((n,), bool), jnp.zeros((n, 3)))
    carry, recs = jax.lax.scan(body, init, keys)
    w_out = carry[5]

    for name in ("pos", "ns", "ng", "uv", "bsdf", "delta", "emitter"):
        path[name] = jnp.moveaxis(recs[name], 0, 1)
    done = jnp.moveaxis(recs["done_now"], 0, 1)  # [N, D]
    first_done = jnp.argmax(done, axis=1)
    has_done = jnp.any(done, axis=1)
    path["length"] = jnp.where(has_done, first_done + 1, 0)
    path["valid"] = has_done & (_lum(w_out) > 0.0)
    path["rgb"] = jnp.where(path["valid"][:, None], w_out, 0.0)
    path["wlum"] = jnp.where(path["valid"], _lum(w_out), 0.0)
    return path


def _slot(path, field, i):
    """path[field][n, i[n]] for per-chain slot indices i."""
    a = path[field]
    return jnp.take_along_axis(
        a, i.reshape(-1, *([1] * (a.ndim - 1))), axis=1)[:, 0]


def _delta_value(scene, bsdf_id, uv, ns, wi, wo, bsdf_types):
    """BSDF delta coefficient (VALUE, not value/pdf): conductor spec·F;
    dielectric reflect spec·F, refract trans·(1-F)·eta_ti²."""
    params = bsdf_mod.gather_params(scene, bsdf_id, uv, types=bsdf_types)
    s_ax, t_ax, n_ax = shading_frame(params, ns, wi)
    wil = to_local(s_ax, t_ax, n_ax, wi)
    wol = to_local(s_ax, t_ax, n_ax, wo)
    cos_i = jnp.abs(wil[..., 2])
    out = jnp.zeros(wi.shape[:-1] + (3,))
    t = params["type"]
    if BSDF_CONDUCTOR in (bsdf_types or (BSDF_CONDUCTOR,)):
        f_c = fresnel_conductor(cos_i, params["eta"][..., None],
                                params["k"])
        out = jnp.where((t == BSDF_CONDUCTOR)[..., None],
                        params["specular"] * f_c, out)
    if BSDF_DIELECTRIC in (bsdf_types or (BSDF_DIELECTRIC,)):
        fr, _, eta_it, eta_ti = fresnel_dielectric(wil[..., 2],
                                                   params["eta"])
        refl = wil[..., 2] * wol[..., 2] > 0.0
        v = jnp.where(
            refl[..., None], params["specular"] * fr[..., None],
            params["albedo"] * ((1.0 - fr) * eta_ti * eta_ti)[..., None],
        )
        out = jnp.where((t == BSDF_DIELECTRIC)[..., None], v, out)
    return out


def _smooth_f(scene, bsdf_id, uv, ns, wi, wo, bsdf_types):
    """BSDF value f(wi, wo) (no cosines) at a connectable vertex."""
    params = bsdf_mod.gather_params(scene, bsdf_id, uv, types=bsdf_types)
    s_ax, t_ax, n_ax = shading_frame(params, ns, wi)
    wil = to_local(s_ax, t_ax, n_ax, wi)
    wol = to_local(s_ax, t_ax, n_ax, wo)
    f, _ = bsdf_mod.eval_pdf_full(params, wil, wol, types=bsdf_types)
    # eval_pdf_full returns f·|cos(wo)| (the tracer's convention); strip
    # the cosine — G terms carry the cosines in the area formulation.
    return f / jnp.maximum(jnp.abs(wol[..., 2:3]), 1e-9)


def _geom(pa, na, pb, nb):
    """G(a,b) with both cosines; also returns (dir a->b, dist)."""
    d = pb - pa
    dist2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20)
    dist = jnp.sqrt(dist2)
    w = d / dist[..., None]
    g = jnp.abs(jnp.sum(na * w, axis=-1)) * jnp.abs(
        jnp.sum(nb * w, axis=-1)) / dist2
    return g, w, dist


def _occluded(scene, pa, ng_a, dir_ab, dist):
    ro = pa + ng_a * jnp.where(
        jnp.sum(ng_a * dir_ab, axis=-1) > 0, RAY_EPS, -RAY_EPS)[:, None]
    hit = isect.intersect(scene, ro, dir_ab)
    return hit["valid"] & (hit["t"] < dist * (1.0 - 1e-3))


def _emitter_le(scene, path, idx, toward):
    """Le of the emitter vertex at slot idx, emitted toward ``toward``."""
    em = _slot(path, "emitter", idx)
    ng = _slot(path, "ng", idx)
    front = jnp.sum(ng * toward, axis=-1) > 0.0
    le = jnp.where((em >= 0)[:, None],
                   scene.emitter_radiance[jnp.maximum(em, 0)], 0.0)
    return le * front[:, None]


def _first_connectable(path):
    """Index j of the first non-delta vertex (the eye-side chain end)."""
    d = path["delta"].shape[1]
    in_range = jnp.arange(d)[None, :] < path["length"][:, None]
    connectable = ~path["delta"] & in_range
    j = jnp.argmax(connectable, axis=1)
    has = jnp.any(connectable, axis=1)
    return j, has


def path_pt_weight(scene, path, bsdf_types):
    """Recompute the PT estimate W (rgb and luminance) of a STORED path:
    Π over vertices of the sampling weight (f·cos/pdf for smooth, the
    component-cancelled delta weight for specular) times Le. This is
    lum(C)/p_PT — the quantity the large-step (independence) acceptance
    compares — and is recomputed after perturbations so a mutated path
    carries the W that path tracing WOULD have assigned it."""
    n = path["length"].shape[0]
    d = path["pos"].shape[1]
    cam = jnp.broadcast_to(scene.cam_to_world[:3, 3], (n, 3))
    w = jnp.ones((n, 3))
    prev = cam
    for i in range(d - 1):
        interior = (i + 1) < path["length"]
        pos_i = path["pos"][:, i]
        nxt = path["pos"][:, i + 1]
        wi = _norm(prev - pos_i)
        wo = _norm(nxt - pos_i)
        params = bsdf_mod.gather_params(scene, path["bsdf"][:, i],
                                        path["uv"][:, i], types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, path["ns"][:, i], wi)
        wil = to_local(s_ax, t_ax, n_ax, wi)
        wol = to_local(s_ax, t_ax, n_ax, wo)
        f, pdf = bsdf_mod.eval_pdf_full(params, wil, wol, types=bsdf_types)
        smooth_w = jnp.where(
            (pdf > 0)[:, None], f / jnp.maximum(pdf, 1e-20)[:, None], 0.0)
        # Delta vertices: the sampling weight with the component
        # probability cancelled (conductor spec·F; dielectric reflect
        # spec, refract trans·eta_ti²) — matches sample_full's weights.
        t = params["type"]
        dw = jnp.zeros((n, 3))
        cos_i = jnp.abs(wil[..., 2])
        if BSDF_CONDUCTOR in bsdf_types:
            f_c = fresnel_conductor(cos_i, params["eta"][..., None],
                                    params["k"])
            dw = jnp.where((t == BSDF_CONDUCTOR)[:, None],
                           params["specular"] * f_c, dw)
        if BSDF_DIELECTRIC in bsdf_types:
            fr, _, eta_it, eta_ti = fresnel_dielectric(wil[..., 2],
                                                       params["eta"])
            refl = wil[..., 2] * wol[..., 2] > 0.0
            v = jnp.where(refl[:, None], params["specular"],
                          params["albedo"] * (eta_ti * eta_ti)[:, None])
            dw = jnp.where((t == BSDF_DIELECTRIC)[:, None], v, dw)
        fac = jnp.where(path["delta"][:, i][:, None], dw, smooth_w)
        w = jnp.where(interior[:, None], w * fac, w)
        prev = jnp.where(interior[:, None], pos_i, prev)

    last = jnp.maximum(path["length"] - 1, 0)
    lpos = _slot(path, "pos", last)
    toward = _norm(prev - lpos)
    le = _emitter_le(scene, path, last, toward)
    w = w * le
    w = jnp.where(path["valid"][:, None], w, 0.0)
    return _lum(w), w


def lens_respan(scene, path, j, upto_valid, bsdf_types):
    """Luminance of the lens-mutation respan weight for the STORED path:
    Π_{i<j}[w_i·cos(ns_i, ω_out)] · f_j · G(e_j, e_{j+1}) · fac_{j+1}.

    j: per-chain index of the reconnect vertex. Returns (lum, rgb_full)
    where rgb_full is the respan color (used for the proposal's splat
    color via the unchanged-suffix cancellation)."""
    n = path["length"].shape[0]
    d = path["pos"].shape[1]
    cam = jnp.broadcast_to(scene.cam_to_world[:3, 3], (n, 3))

    w = jnp.ones((n, 3))
    prev = cam
    for i in range(d - 1):
        active = (i < j) & upto_valid
        pos_i = path["pos"][:, i]
        nxt = path["pos"][:, i + 1]
        wi = _norm(prev - pos_i)
        wo = _norm(nxt - pos_i)
        val = _delta_value(scene, path["bsdf"][:, i], path["uv"][:, i],
                           path["ns"][:, i], wi, wo, bsdf_types)
        cos_out = jnp.abs(jnp.sum(path["ns"][:, i] * wo, axis=-1))
        w = jnp.where(active[:, None], w * val * cos_out[:, None], w)
        prev = jnp.where((i < j)[:, None], pos_i, prev)

    # Reconnect pair (e_j, e_{j+1}).
    pj = _slot(path, "pos", j)
    nj = _slot(path, "ns", j)
    jp1 = j + 1
    pj1 = _slot(path, "pos", jp1)
    nj1 = _slot(path, "ns", jp1)
    g, w_jj1, dist = _geom(pj, nj, pj1, nj1)
    wi_j = _norm(prev - pj)
    f_j = _smooth_f(scene, _slot(path, "bsdf", j), _slot(path, "uv", j),
                    nj, wi_j, w_jj1, bsdf_types)
    w = w * f_j * g[:, None]

    # Factor at e_{j+1}: Le if it is the emitter vertex, else its BSDF
    # with the changed incident direction.
    is_emitter = (jp1 + 1) == path["length"]
    le = _emitter_le(scene, path, jp1, -w_jj1)
    # wo at e_{j+1} points to e_{j+2} (unchanged geometry).
    jp2 = jnp.minimum(jp1 + 1, d - 1)
    pj2 = _slot(path, "pos", jp2)
    wo_j1 = _norm(pj2 - pj1)
    f_j1 = _smooth_f(scene, _slot(path, "bsdf", jp1),
                     _slot(path, "uv", jp1), nj1, -w_jj1, wo_j1,
                     bsdf_types)
    fac = jnp.where(is_emitter[:, None], le, f_j1)
    w = w * fac
    w = jnp.where(upto_valid[:, None], w, 0.0)
    return _lum(w), w


def retrace_chain(scene, path, spos_new, j, width, height, bsdf_types,
                  fov_axis):
    """Re-trace the eye prefix at a new screen position through the
    stored delta-chain structure (reference: perturbDirection +
    propagatePerturbation, mut_lens.cpp:131-155).

    Returns (new path dict with slots 0..j replaced, ok mask)."""
    n = spos_new.shape[0]
    d = path["pos"].shape[1]
    ro, rd = generate_rays(scene, spos_new, width, height, fov_axis)
    new = {k: v for k, v in path.items()}
    new["spos"] = spos_new
    ok = jnp.ones((n,), bool)

    for i in range(d):
        step_active = i <= j
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        # Configuration must match (reference: matchesConfiguration):
        # same bsdf id at every re-traced slot.
        same = hit["valid"] & (it["bsdf"] == path["bsdf"][:, i])
        ok = ok & jnp.where(step_active, same, True)
        upd = (step_active & ok)[:, None]
        for f, v in (("pos", it["p"]), ("ns", it["ns"]), ("ng", it["ng"]),
                     ("uv", it["uv"][..., :2])):
            new[f] = new[f].at[:, i].set(jnp.where(upd, v, new[f][:, i]))
        if i + 1 >= d:
            break
        # Propagate through the delta vertex (deterministic component:
        # reflect, or refract if the stored geometry transmits).
        wi = -rd
        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], wi)
        wil = to_local(s_ax, t_ax, n_ax, wi)
        # Stored transmit flag from source geometry at slot i.
        prev_src = path["pos"][:, i - 1] if i > 0 else jnp.broadcast_to(
            scene.cam_to_world[:3, 3], (n, 3))
        wi_src = _norm(prev_src - path["pos"][:, i])
        wo_src = _norm(path["pos"][:, i + 1] - path["pos"][:, i])
        transmit = (jnp.sum(wi_src * path["ns"][:, i], axis=-1)
                    * jnp.sum(wo_src * path["ns"][:, i], axis=-1)) < 0.0
        # Reflect in local frame.
        refl = jnp.stack([-wil[..., 0], -wil[..., 1], wil[..., 2]], -1)
        fr, cos_t, eta_it, eta_ti = fresnel_dielectric(wil[..., 2],
                                                       params["eta"])
        refr = jnp.stack([-wil[..., 0] * eta_ti, -wil[..., 1] * eta_ti,
                          cos_t], -1)
        tir = fr >= 1.0 - 1e-6
        wol = jnp.where(transmit[:, None], refr, refl)
        ok = ok & jnp.where(step_active & (i < j) & transmit, ~tir, True)
        from ..core.frame import to_world

        wo_world = to_world(s_ax, t_ax, n_ax, wol)
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ro = it["p"] + it["ng"] * jnp.where(
            wo_dot_geo > 0, RAY_EPS, -RAY_EPS)[:, None]
        rd = jnp.where((i < j)[:, None], wo_world, rd)
    return new, ok



def project_to_screen(scene, p, width, height, fov_axis):
    """World point -> (screen xy [N,2], in_front mask, cos^3 theta, dist).
    Inverse of sensor.generate_rays' perspective mapping."""
    rot = scene.cam_to_world[:3, :3]
    origin = scene.cam_to_world[:3, 3]
    rel = p - origin
    d_cam = rel @ rot  # = R^T (p - o)
    z = d_cam[..., 2]
    in_front = z > 1e-6
    aspect = width / height
    tan_half = scene.cam_tan_half_fov
    tx = tan_half if fov_axis == "x" else tan_half * aspect
    ty = tan_half / aspect if fov_axis == "x" else tan_half
    zs = jnp.where(in_front, z, 1.0)
    sx = d_cam[..., 0] / (zs * tx)
    sy = d_cam[..., 1] / (zs * ty)
    px = (1.0 - sx) * 0.5 * width
    py = (1.0 - sy) * 0.5 * height
    dist = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-20))
    cos_cam = zs / dist
    return jnp.stack([px, py], -1), in_front, cos_cam ** 3, dist


def _second_connectable(path):
    """Caustic structure: slot 0 (e_1) connectable; slots 1..m-1 delta;
    slot m connectable and interior. Returns (m, ok)."""
    d = path["delta"].shape[1]
    in_range = jnp.arange(d)[None, :] < path["length"][:, None]
    conn = ~path["delta"] & in_range
    above0 = jnp.arange(d)[None, :] >= 1
    m = jnp.argmax(conn & above0, axis=1)
    has = jnp.any(conn & above0, axis=1)
    ok = (~path["delta"][:, 0] & has
          & ((m + 1) < path["length"]))  # interior BSDF vertex
    return m, ok


def retrace_down(scene, path, m, wo_new, bsdf_types):
    """Re-trace from vertex e_m along wo_new DOWN through the stored
    delta chain, replacing slots m-1..0 (reference: perturbDirection +
    propagatePerturbation, mut_caustic.cpp:126-158)."""
    n = wo_new.shape[0]
    d = path["pos"].shape[1]
    new = {k: v for k, v in path.items()}
    ok = jnp.ones((n,), bool)
    ro = _slot(path, "pos", m)
    ng_m = _slot(path, "ng", m)
    ro = ro + ng_m * jnp.where(
        jnp.sum(ng_m * wo_new, axis=-1) > 0, RAY_EPS, -RAY_EPS)[:, None]
    rd = wo_new
    from ..core.frame import to_world

    for step in range(d - 1):
        slot = m - 1 - step
        step_active = slot >= 0
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        # Config match: same bsdf at every re-traced slot.
        src_bsdf = _slot(path, "bsdf", jnp.maximum(slot, 0))
        same = hit["valid"] & (it["bsdf"] == src_bsdf)
        ok = ok & jnp.where(step_active, same, True)
        upd = (step_active & ok)[:, None]
        sl = jnp.maximum(slot, 0)
        for f, v in (("pos", it["p"]), ("ns", it["ns"]), ("ng", it["ng"]),
                     ("uv", it["uv"][..., :2])):
            col = jnp.take_along_axis(new[f], sl.reshape(
                -1, *([1] * (new[f].ndim - 1))), axis=1)[:, 0]
            merged = jnp.where(upd, v, col)
            new[f] = jax.vmap(lambda arr, i, val: arr.at[i].set(val))(
                new[f], sl, merged)
        # Deterministic delta bounce toward the next lower slot.
        wi = -rd
        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], wi)
        wil = to_local(s_ax, t_ax, n_ax, wi)
        # Stored transmit flag at this slot (from source geometry).
        above = _slot(path, "pos", jnp.minimum(sl + 1, d - 1))
        below = _slot(path, "pos", jnp.maximum(sl - 1, 0))
        pos_src = _slot(path, "pos", sl)
        ns_src = _slot(path, "ns", sl)
        wi_src = _norm(above - pos_src)
        wo_src = _norm(below - pos_src)
        transmit = (jnp.sum(wi_src * ns_src, axis=-1)
                    * jnp.sum(wo_src * ns_src, axis=-1)) < 0.0
        refl = jnp.stack([-wil[..., 0], -wil[..., 1], wil[..., 2]], -1)
        fr, cos_t, eta_it, eta_ti = fresnel_dielectric(wil[..., 2],
                                                       params["eta"])
        refr = jnp.stack([-wil[..., 0] * eta_ti, -wil[..., 1] * eta_ti,
                          cos_t], -1)
        tir = fr >= 1.0 - 1e-6
        wol = jnp.where(transmit[:, None], refr, refl)
        ok = ok & jnp.where(step_active & (slot > 0) & transmit, ~tir,
                            True)
        wo_world = to_world(s_ax, t_ax, n_ax, wol)
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ro = it["p"] + it["ng"] * jnp.where(
            wo_dot_geo > 0, RAY_EPS, -RAY_EPS)[:, None]
        rd = jnp.where((slot > 0)[:, None] if hasattr(slot, "shape")
                       else (jnp.full((n,), slot > 0)[:, None]),
                       wo_world, rd)
    return new, ok


def caustic_respan(scene, path, m, valid, width, height, bsdf_types,
                   fov_axis):
    """Luminance of the caustic respan weight:
    f_m·cos(ns_m, ω_out) · Π_{i=m-1..2}[w_i·cos(ns_i, ω_out)] ·
    f_1 · d_cam²·cos³θ_cam / cos(ns_1, ω_cam)."""
    n = path["length"].shape[0]
    d = path["pos"].shape[1]
    # Vertex m factor.
    pm = _slot(path, "pos", m)
    nsm = _slot(path, "ns", m)
    pm1 = _slot(path, "pos", jnp.maximum(m - 1, 0))
    above = _slot(path, "pos", jnp.minimum(m + 1, d - 1))
    wo_m = _norm(pm1 - pm)
    wi_m = _norm(above - pm)
    f_m = _smooth_f(scene, _slot(path, "bsdf", m), _slot(path, "uv", m),
                    nsm, wi_m, wo_m, bsdf_types)
    w = f_m * jnp.abs(jnp.sum(nsm * wo_m, axis=-1))[:, None]
    # Delta chain slots m-1..1.
    for i in range(d - 2, 0, -1):
        active = (i < m) & (i >= 1) & valid
        pos_i = path["pos"][:, i]
        above_i = path["pos"][:, i + 1]
        below_i = path["pos"][:, i - 1]
        wi = _norm(above_i - pos_i)
        wo = _norm(below_i - pos_i)
        val = _delta_value(scene, path["bsdf"][:, i], path["uv"][:, i],
                           path["ns"][:, i], wi, wo, bsdf_types)
        cos_out = jnp.abs(jnp.sum(path["ns"][:, i] * wo, axis=-1))
        w = jnp.where(active[:, None], w * val * cos_out[:, None], w)
    # Camera-visible vertex e_1 (slot 0) + screen reprojection Jacobian.
    p1 = path["pos"][:, 0]
    ns1 = path["ns"][:, 0]
    cam = jnp.broadcast_to(scene.cam_to_world[:3, 3], (n, 3))
    wo_cam = _norm(cam - p1)
    wi_1 = _norm(path["pos"][:, 1] - p1)
    f_1 = _smooth_f(scene, path["bsdf"][:, 0], path["uv"][:, 0], ns1,
                    wi_1, wo_cam, bsdf_types)
    _, in_front, cos3, dist = project_to_screen(scene, p1, width, height,
                                                fov_axis)
    jac = dist * dist * cos3 / jnp.maximum(
        jnp.abs(jnp.sum(ns1 * wo_cam, axis=-1)), 1e-9)
    w = w * f_1 * jac[:, None]
    w = jnp.where((valid & in_front)[:, None], w, 0.0)
    return _lum(w), w


@partial(jax.jit, static_argnames=(
    "width", "height", "max_depth", "bsdf_types", "fov_axis", "n_steps",
))
def mlt_chain_step(scene, paths, key, width, height, max_depth,
                   bsdf_types, fov_axis, n_steps=8):
    """Advance all chains n_steps mutations; returns (paths, splat dict,
    large-step W sum + count for the normalization constant)."""
    n = paths["length"].shape[0]

    def do_large(paths, k):
        k1, k2 = jax.random.split(k)
        spos = jax.random.uniform(k1, (n, 2)) * jnp.array(
            [width, height], jnp.float32)
        prop = trace_path_record(scene, k2, spos, width, height,
                                 max_depth, bsdf_types, fov_axis)
        a = jnp.where(
            paths["wlum"] > 0.0,
            jnp.minimum(1.0, prop["wlum"] / jnp.maximum(paths["wlum"],
                                                        1e-30)),
            jnp.where(prop["valid"], 1.0, 0.0),
        )
        return prop, a, prop["wlum"]

    def do_lens(paths, k):
        k1, k2 = jax.random.split(k)
        r2 = jnp.sqrt(LENS_AREA * width * height / jnp.pi)
        u = jax.random.uniform(k1, (n, 2))
        r = r2 * jnp.exp(jnp.log(LENS_R1 / r2) * u[:, 0])
        phi = 2.0 * jnp.pi * u[:, 1]
        off = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], -1)
        spos_new = paths["spos"] + off
        inside = ((spos_new[:, 0] > 0) & (spos_new[:, 0] < width)
                  & (spos_new[:, 1] > 0) & (spos_new[:, 1] < height))

        j, has_j = _first_connectable(paths)
        # Suitability: e_j and e_{j+1} both exist; e_{j+1} connectable
        # or the emitter vertex (mut_lens.cpp:60-69).
        jp1_in = (j + 1) < paths["length"]
        jp1_conn = ~_slot(paths, "delta", jnp.minimum(
            j + 1, paths["length"] - 1)) | ((j + 2) == paths["length"])
        suitable = paths["valid"] & has_j & jp1_in & jp1_conn & inside

        prop, ok = retrace_chain(scene, paths, spos_new, j, width, height,
                                 bsdf_types, fov_axis)
        # e_j' must still be connectable (same bsdf id => same lobe set).
        # Visibility e_j' -> e_{j+1}.
        pj = _slot(prop, "pos", j)
        ngj = _slot(prop, "ng", j)
        pj1 = _slot(prop, "pos", j + 1)
        _, dir_jj1, dist = _geom(pj, ngj, pj1, _slot(prop, "ns", j + 1))
        occ = _occluded(scene, pj, ngj, dir_jj1, dist)
        valid = suitable & ok & ~occ

        lum_y, rgb_y = lens_respan(scene, prop, j, valid, bsdf_types)
        lum_x, rgb_x = lens_respan(scene, paths, j, suitable, bsdf_types)
        a = jnp.where(
            valid & (lum_x > 0.0),
            jnp.minimum(1.0, lum_y / jnp.maximum(lum_x, 1e-30)), 0.0)
        prop["valid"] = paths["valid"]
        prop["length"] = paths["length"]
        # Recompute the proposal's PT weight/color from its geometry so
        # future large-step acceptances compare consistent quantities.
        wl, rgb = path_pt_weight(scene, prop, bsdf_types)
        prop["wlum"] = jnp.where(valid, wl, paths["wlum"])
        prop["rgb"] = jnp.where(valid[:, None], rgb, paths["rgb"])
        a = jnp.where(wl > 0.0, a, 0.0)
        return prop, a

    def do_caustic(paths, k):
        k1, k2 = jax.random.split(k)
        m, ok_struct = _second_connectable(paths)
        suitable = paths["valid"] & ok_struct

        # Veach p.354 heuristic angle scaling (mut_caustic.cpp:94-101):
        # theta range scaled by eye-edge length over chain length.
        cam = jnp.broadcast_to(scene.cam_to_world[:3, 3], (n, 3))
        len_e = jnp.sqrt(jnp.maximum(jnp.sum(
            (paths["pos"][:, 0] - cam) ** 2, axis=-1), 1e-12))
        d_slots = paths["pos"].shape[1]
        len_l = jnp.zeros((n,))
        for i in range(d_slots - 1):
            seg = jnp.sqrt(jnp.maximum(jnp.sum(
                (paths["pos"][:, i + 1] - paths["pos"][:, i]) ** 2,
                axis=-1), 1e-12))
            len_l = len_l + jnp.where(i < m, seg, 0.0)
        rad_per_pixel = 2.0 * scene.cam_tan_half_fov / width
        factor = len_e / jnp.maximum(len_l, 1e-9)
        th1 = CAUSTIC_R1 * rad_per_pixel * factor
        th2 = CAUSTIC_R2 * rad_per_pixel * factor

        pm = _slot(paths, "pos", m)
        pm1 = _slot(paths, "pos", jnp.maximum(m - 1, 0))
        wo_src = _norm(pm1 - pm)
        u = jax.random.uniform(k1, (n, 2))
        theta = th2 * jnp.exp(jnp.log(th1 / jnp.maximum(th2, 1e-12))
                              * u[:, 0])
        phi = 2.0 * jnp.pi * u[:, 1]
        from ..core.frame import coordinate_system as _cs

        s_ax, t_ax = _cs(wo_src)
        st = jnp.sin(theta)
        wo_new = (s_ax * (st * jnp.cos(phi))[:, None]
                  + t_ax * (st * jnp.sin(phi))[:, None]
                  + wo_src * jnp.cos(theta)[:, None])

        prop, ok = retrace_down(scene, paths, m, wo_new, bsdf_types)
        # Reproject e_1' onto the film; visibility from the camera.
        p1 = prop["pos"][:, 0]
        spos_new, in_front, _, dist_cam = project_to_screen(
            scene, p1, width, height, fov_axis)
        inside = ((spos_new[:, 0] > 0) & (spos_new[:, 0] < width)
                  & (spos_new[:, 1] > 0) & (spos_new[:, 1] < height))
        dir_c1 = _norm(p1 - cam)
        hitc = isect.intersect(scene, cam, dir_c1)
        vis = hitc["valid"] & (jnp.abs(hitc["t"] - dist_cam)
                               < 1e-3 * dist_cam + 1e-4)
        valid = suitable & ok & in_front & inside & vis

        # Proposal-side theta range check with the PROPOSAL's heuristic
        # factor (mut_caustic.cpp:137-141 + Q:190-196).
        len_l_y = jnp.zeros((n,))
        for i in range(d_slots - 1):
            seg = jnp.sqrt(jnp.maximum(jnp.sum(
                (prop["pos"][:, i + 1] - prop["pos"][:, i]) ** 2,
                axis=-1), 1e-12))
            len_l_y = len_l_y + jnp.where(i < m, seg, 0.0)
        len_e_y = jnp.sqrt(jnp.maximum(jnp.sum(
            (prop["pos"][:, 0] - cam) ** 2, axis=-1), 1e-12))
        fac_y = len_e_y / jnp.maximum(len_l_y, 1e-9)
        th1y = CAUSTIC_R1 * rad_per_pixel * fac_y
        th2y = CAUSTIC_R2 * rad_per_pixel * fac_y
        valid = valid & (theta > th1y) & (theta < th2y)

        prop["spos"] = jnp.where(valid[:, None], spos_new, paths["spos"])
        prop["valid"] = paths["valid"]
        prop["length"] = paths["length"]

        lum_y, _ = caustic_respan(scene, prop, m, valid, width, height,
                                  bsdf_types, fov_axis)
        lum_x, _ = caustic_respan(scene, paths, m, suitable, width,
                                  height, bsdf_types, fov_axis)
        a = jnp.where(
            valid & (lum_x > 0.0),
            jnp.minimum(1.0, lum_y / jnp.maximum(lum_x, 1e-30)), 0.0)
        wl, rgb = path_pt_weight(scene, prop, bsdf_types)
        prop["wlum"] = jnp.where(valid, wl, paths["wlum"])
        prop["rgb"] = jnp.where(valid[:, None], rgb, paths["rgb"])
        a = jnp.where(wl > 0.0, a, 0.0)
        return prop, a

    def step(carry, k):
        paths, wsum, wcount = carry
        k_sel, k_mut = jax.random.split(k)
        u = jax.random.uniform(k_sel, (n,))

        large, a_l, w_l = do_large(paths, k_mut)
        lens, a_lens = do_lens(paths, jax.random.fold_in(k_mut, 1))
        caustic, a_c = do_caustic(paths, jax.random.fold_in(k_mut, 2))

        pick_large = u < P_LARGE
        pick_lens = (u >= P_LARGE) & (u < P_LARGE + P_LENS)
        a = jnp.where(pick_large, a_l,
                      jnp.where(pick_lens, a_lens, a_c))

        def merge(pl, pn, pc):
            sel_l = pick_large.reshape(-1, *([1] * (pl.ndim - 1)))
            sel_n = pick_lens.reshape(-1, *([1] * (pl.ndim - 1)))
            return jnp.where(sel_l, pl, jnp.where(sel_n, pn, pc))

        prop = jax.tree.map(merge, large, lens, caustic)

        wsum = wsum + jnp.sum(jnp.where(pick_large, w_l, 0.0))
        wcount = wcount + jnp.sum(pick_large.astype(jnp.float32))

        # Expected-values splat (Veach 11.3.1): both states deposit.
        lum_cur = _lum(paths["rgb"])
        lum_prop = _lum(prop["rgb"])
        cur_color = jnp.where(
            (lum_cur > 0)[:, None], paths["rgb"] / jnp.maximum(
                lum_cur, 1e-30)[:, None], 0.0)
        prop_color = jnp.where(
            (lum_prop > 0)[:, None], prop["rgb"] / jnp.maximum(
                lum_prop, 1e-30)[:, None], 0.0)
        splat_pix = jnp.concatenate([paths["spos"], prop["spos"]], axis=0)
        splat_val = jnp.concatenate([
            cur_color * (1.0 - a)[:, None], prop_color * a[:, None]],
            axis=0)

        u_acc = jax.random.uniform(jax.random.fold_in(k_sel, 1), (n,))
        accept = u_acc < a
        paths = jax.tree.map(
            lambda c, p: jnp.where(
                accept.reshape(-1, *([1] * (c.ndim - 1))), p, c),
            paths, prop)
        return (paths, wsum, wcount), (splat_pix, splat_val)

    keys = jax.random.split(key, n_steps)
    (paths, wsum, wcount), (pix_s, val_s) = jax.lax.scan(
        step, (paths, jnp.float32(0.0), jnp.float32(0.0)), keys)
    return paths, pix_s.reshape(-1, 2), val_s.reshape(-1, 3), wsum, wcount


def render_mlt(scene, cfg, spp: int = 16, seed: int = 1234,
               n_chains: int = 8192, bsdf_types: tuple | None = None):
    """Render with path-space MLT. Returns dict(image [H,W,3])."""
    width, height = cfg.width, cfg.height
    n_pix = width * height
    bsdf_types = tuple(bsdf_types or cfg.bsdf_types)
    key = jax.random.PRNGKey(seed)
    d = cfg.max_depth

    # Bootstrap: PT paths; b = E[W] (the normalization constant), chains
    # seeded by resampling proportional to W (reference mlt_proc seeding).
    k0, k1, k2 = jax.random.split(key, 3)
    n_boot = max(n_chains * 4, 1 << 15)
    spos = jax.random.uniform(k0, (n_boot, 2)) * jnp.array(
        [width, height], jnp.float32)
    boot = trace_path_record(scene, k1, spos, width, height, d,
                             bsdf_types, cfg.fov_axis)
    w = boot["wlum"]
    b = float(jnp.mean(w))
    if b <= 0.0:
        # No bootstrap path found an emitter (e.g. env-only scenes —
        # environment transport is not in the unidirectional MLT subspace
        # yet; use pssmlt for those).
        return {"image": np.zeros((height, width, 3), np.float32),
                "b": 0.0}
    idx = jax.random.categorical(
        k2, jnp.log(jnp.maximum(w, 1e-30)), shape=(n_chains,))
    paths = jax.tree.map(lambda a: a[idx], boot)

    total_mutations = n_pix * spp
    steps_per_round = 8
    rounds = max(1, total_mutations // (n_chains * steps_per_round))
    film = jnp.zeros((n_pix, 3))
    wsum_t, wcount_t = 0.0, 0.0
    for r in range(rounds):
        kr = jax.random.fold_in(key, 100 + r)
        paths, pix_s, val_s, wsum, wcount = mlt_chain_step(
            scene, paths, kr, width, height, d, bsdf_types,
            cfg.fov_axis, n_steps=steps_per_round)
        px = jnp.clip(pix_s[:, 0].astype(jnp.int32), 0, width - 1)
        py = jnp.clip(pix_s[:, 1].astype(jnp.int32), 0, height - 1)
        film = film.at[py * width + px].add(val_s)
        wsum_t += float(wsum)
        wcount_t += float(wcount)

    # Refresh b with in-run large steps (more samples than the bootstrap).
    if wcount_t > 0:
        b = 0.5 * b + 0.5 * (wsum_t / wcount_t)
    n_mut = rounds * steps_per_round * n_chains
    img = np.asarray(film).reshape(height, width, 3)
    img = img * (b * n_pix / max(n_mut, 1))
    return {"image": img.astype(np.float32), "b": b}
