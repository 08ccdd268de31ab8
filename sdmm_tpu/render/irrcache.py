"""Irradiance caching integrator (TPU-native redesign).

Reference: mitsuba/src/integrators/misc/irrcache.cpp (+ the cache itself,
librender/irrcache.cpp — octree of irradiance records, Ward/Tabellion
weights w_i = 1/(d/R_i + sqrt(1 - n.n_i)) with the 1/kappa validity
cutoff, overture pre-pass, final-gather hemisphere of 2*res^2 stratified
rays).

TPU redesign: records are not created on demand behind a mutex-guarded
octree — placement is a *batched* pass: camera-visible shading points
(followed through up to two delta/glossy bounces) are hashed into a
(cell, normal-bin) table, one representative per occupied slot, and ALL
records run their stratified cosine-weighted final gather as one giant
wavefront through the path tracer. Interpolation probes the 27 spatial
neighbor cells with gathered weights — no tree traversal anywhere.

Simplifications vs the reference (documented): no irradiance gradients
(gradients=false equivalent) and no screen-space radius clamp; the record
radius is the gather's harmonic mean distance clamped to the cell size
(the effect of Krivanek neighbor clamping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..core.frame import coordinate_system, to_local, to_world
from ..core import warp
from ..scene import emitters
from ..scene.sensor import generate_rays
from . import intersect as isect
from ..scene.scene import BSDF_DIFFUSE, BSDF_ROUGHDIFFUSE
from .volpath import RAY_EPS, mi_weight, shading_frame, trace_wave


def _is_diffuse(params):
    t = params["type"]
    return (t == BSDF_DIFFUSE) | (t == BSDF_ROUGHDIFFUSE)

TABLE = 4096  # record table size (power of two)
_H1 = 0x9E3779B1  # Fibonacci hashing multiplier


def _cell_of(scene, p, grid_res: int):
    lo = scene.aabb_lo
    ext = jnp.maximum(scene.aabb_hi - lo, 1e-6)
    cell = jnp.max(ext) / grid_res
    c = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, 4 * grid_res)
    return c, cell


def _nbin(n):
    """Dominant-axis normal bin (6 bins)."""
    a = jnp.abs(n)
    axis = jnp.argmax(a, axis=-1)
    sign = jnp.take_along_axis(n, axis[..., None], -1)[..., 0] < 0.0
    return axis * 2 + sign.astype(jnp.int32)


def _slot(c, nb):
    key = ((c[..., 0] * 731 + c[..., 1]) * 2683 + c[..., 2]) * 6 + nb
    h = key.astype(jnp.uint32) * jnp.uint32(_H1)
    return ((h >> 8) % jnp.uint32(TABLE)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("grid_res", "gather_res", "bsdf_types",
                                   "max_depth", "n_candidates", "width",
                                   "height", "fov_axis"))
def build_cache(scene, key, width: int, height: int, grid_res: int = 48,
                gather_res: int = 14, bsdf_types: tuple | None = None,
                max_depth: int = 10, n_candidates: int = 1 << 16,
                fov_axis: str = "x"):
    """Overture pass: place records at camera-visible diffuse points and
    final-gather each with 2*res^2 stratified cosine rays.

    Returns the cache pytree (pos/n/E/R per table slot + cell metadata).
    """
    k_pix, k_b, k_g = jax.random.split(key, 3)
    # Candidate shading points: strided pixels, followed through up to two
    # non-diffuse bounces (so surfaces seen via mirrors/glass get records).
    n_pix = width * height
    pix = (jnp.arange(n_candidates) * 9973) % n_pix
    u = jax.random.uniform(k_pix, (n_candidates, 2))
    px = (pix % width).astype(jnp.float32) + u[:, 0]
    py = (pix // width).astype(jnp.float32) + u[:, 1]
    ro, rd = generate_rays(scene, jnp.stack([px, py], -1), width, height,
                           fov_axis)
    pos = jnp.zeros((n_candidates, 3))
    nrm = jnp.zeros((n_candidates, 3))
    found = jnp.zeros(n_candidates, bool)
    for b in range(3):
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        new = ~found & hit["valid"] & _is_diffuse(params)
        pos = jnp.where(new[:, None], it["p"], pos)
        nrm = jnp.where(new[:, None], it["ns"], nrm)
        found = found | new
        if b == 2:
            break
        # Continue through delta surfaces.
        kb = jax.random.fold_in(k_b, b)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_l = to_local(s_ax, t_ax, n_ax, -rd)
        bs = bsdf_mod.sample_full(
            params, wi_l, jax.random.uniform(kb, (n_candidates,)),
            jax.random.uniform(jax.random.fold_in(kb, 1), (n_candidates,)),
            jax.random.uniform(jax.random.fold_in(kb, 2), (n_candidates, 2)),
            types=bsdf_types,
        )
        wo_w = to_world(s_ax, t_ax, n_ax, bs["wo"])
        off = jnp.where(jnp.sum(it["ng"] * wo_w, -1) > 0, RAY_EPS, -RAY_EPS)
        ro = it["p"] + it["ng"] * off[:, None]
        rd = wo_w

    cand_cell, cell = _cell_of(scene, pos, grid_res)
    cand_slot = _slot(cand_cell, _nbin(nrm))
    # Invalid candidates scatter into a sacrificial row TABLE.
    table = jnp.full((TABLE + 1,), -1, jnp.int32)
    table = table.at[jnp.where(found, cand_slot, TABLE)].set(
        jnp.arange(n_candidates, dtype=jnp.int32)
    )
    table = table[:TABLE]
    rec_idx = jnp.maximum(table, 0)
    rec_valid = table >= 0
    rec_pos = jnp.where(rec_valid[:, None], pos[rec_idx], 0.0)
    rec_n = jnp.where(rec_valid[:, None], nrm[rec_idx], 0.0)
    rec_cell, _ = _cell_of(scene, rec_pos, grid_res)

    # --- Final gather: 2*res^2 stratified cosine-weighted rays/record ---
    n_el = gather_res
    n_az = 2 * gather_res
    g = n_el * n_az
    ii = jnp.arange(g)
    su = jax.random.uniform(k_g, (TABLE, g, 2))
    u1 = ((ii // n_az).astype(jnp.float32)[None] + su[..., 0]) / n_el
    u2 = ((ii % n_az).astype(jnp.float32)[None] + su[..., 1]) / n_az
    d_local = warp.square_to_cosine_hemisphere(jnp.stack([u1, u2], -1))
    s_ax, t_ax = coordinate_system(rec_n)
    d = (s_ax[:, None] * d_local[..., 0:1]
         + t_ax[:, None] * d_local[..., 1:2]
         + rec_n[:, None] * d_local[..., 2:3])  # [TABLE, g, 3]
    o = rec_pos[:, None] + rec_n[:, None] * RAY_EPS
    o = jnp.broadcast_to(o, d.shape).reshape(-1, 3)
    d = d.reshape(-1, 3)
    # First-hit data: distances for R_i; Le to subtract (direct illumination
    # is rendered separately — gather must exclude the emitter-visible hop,
    # like the reference's final gather).
    ghit = isect.intersect(scene, o, d)
    git = isect.surface_interaction(scene, o, d, ghit)
    le = emitters.eval_emitter(scene, git, -d)
    li = trace_wave(
        scene, jax.random.fold_in(k_g, 7), o, d,
        max_depth=max_depth, rr_depth=max_depth, nee=True,
        bsdf_types=bsdf_types,
    )
    li_ind = jnp.maximum(li - le, 0.0).reshape(TABLE, g, 3)
    # Cosine-weighted MC: E = pi * mean(Li).
    rec_e = jnp.pi * li_ind.mean(axis=1)
    inv_d = jnp.where(ghit["valid"], 1.0 / jnp.maximum(ghit["t"], 1e-6), 0.0)
    inv_d = inv_d.reshape(TABLE, g)
    n_hit = (inv_d > 0).sum(axis=1)
    r_harm = jnp.where(
        n_hit > 0, n_hit / jnp.maximum(inv_d.sum(axis=1), 1e-9), 1e6
    )
    # Krivanek-style clamp: keep radii near the record spacing.
    rec_r = jnp.clip(r_harm, 0.75 * cell, 3.0 * cell)
    return {
        "pos": rec_pos, "n": rec_n, "E": rec_e, "R": rec_r,
        "valid": rec_valid, "cell_idx": rec_cell, "cell": cell,
        "grid_res": jnp.int32(grid_res),
    }


def interpolate(cache, scene, p, n, grid_res: int, kappa: float = 1.0):
    """Weighted-record irradiance at (p, n): Ward weights over the 27
    neighbor cells, with nearest-record fallback when no weight clears
    the 1/kappa cutoff. Returns (E [N,3], covered [N])."""
    c, _ = _cell_of(scene, p, grid_res)
    nb = _nbin(n)
    e_acc = jnp.zeros(p.shape[:-1] + (3,))
    w_acc = jnp.zeros(p.shape[:-1])
    best_d = jnp.full(p.shape[:-1], 1e30)
    best_e = jnp.zeros(p.shape[:-1] + (3,))
    any_rec = jnp.zeros(p.shape[:-1], bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cc = c + jnp.array([dx, dy, dz], jnp.int32)
                s = _slot(cc, nb)
                ok = cache["valid"][s] & jnp.all(
                    cache["cell_idx"][s] == cc, axis=-1
                )
                rp = cache["pos"][s]
                rn = cache["n"][s]
                re_ = cache["E"][s]
                rr = cache["R"][s]
                d = jnp.linalg.norm(p - rp, axis=-1)
                ndot = jnp.clip(jnp.sum(n * rn, axis=-1), -1.0, 1.0)
                w = 1.0 / jnp.maximum(
                    d / jnp.maximum(rr, 1e-6)
                    + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0)),
                    1e-4,
                )
                use = ok & (w > 1.0 / kappa) & (ndot > 0.2)
                w = jnp.where(use, w, 0.0)
                e_acc = e_acc + w[..., None] * re_
                w_acc = w_acc + w
                near = ok & (d < best_d) & (ndot > 0.2)
                best_d = jnp.where(near, d, best_d)
                best_e = jnp.where(near[..., None], re_, best_e)
                any_rec = any_rec | ok & (ndot > 0.2)
    covered = w_acc > 0.0
    e = jnp.where(covered[..., None], e_acc / jnp.maximum(w_acc, 1e-9)[..., None],
                  jnp.where(any_rec[..., None], best_e, 0.0))
    return e, covered | any_rec


def make_trace_fn(cache, cfg, grid_res: int, kappa: float = 1.0,
                  indirect_only: bool = False):
    """Build a trace_fn for renderer.render: path-trace through delta/
    glossy vertices; at the first diffuse vertex shade with exact NEE
    direct lighting plus cached indirect irradiance."""
    bsdf_types = cfg.bsdf_types or None

    def trace(scene, key, ro, rd):
        n_rays = ro.shape[0]
        li = jnp.zeros((n_rays, 3))
        thr = jnp.ones((n_rays, 3))
        active = jnp.ones(n_rays, bool)
        pdf_over_area = emitters.tri_pdf_over_area(scene)
        prev_delta = jnp.ones(n_rays, bool)
        prev_pdf = jnp.ones(n_rays)
        for b in range(3):
            k = jax.random.fold_in(key, b)
            hit = isect.intersect(scene, ro, rd)
            it = isect.surface_interaction(scene, ro, rd, hit)
            le = emitters.eval_emitter(scene, it, -rd)
            pdf_nee = emitters.pdf_direct_hit(
                scene, pdf_over_area, hit["tri"], rd, hit["t"]
            )
            w_hit = jnp.where(prev_delta, 1.0, mi_weight(prev_pdf, pdf_nee))
            if not indirect_only:
                li = li + jnp.where(
                    active[:, None], thr * le * w_hit[:, None], 0.0
                )
                li = li + jnp.where(
                    (active & ~hit["valid"])[:, None],
                    thr * emitters.env_eval(scene, rd), 0.0,
                )
            on_surf = active & hit["valid"]
            params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                            types=bsdf_types)
            s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
            wi_l = to_local(s_ax, t_ax, n_ax, -rd)
            smooth = bsdf_mod.has_smooth(params)
            diffuse_here = on_surf & _is_diffuse(params)

            # Exact direct lighting at the diffuse vertex (one NEE sample,
            # MIS vs BSDF handled via the emitter-hit term above).
            if not indirect_only:
                u1 = jax.random.uniform(k, (n_rays,))
                u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n_rays, 2))
                ls = emitters.sample_direct(scene, it["p"], u1, u2)
                wo_l = to_local(s_ax, t_ax, n_ax, ls["d"])
                f, pdf_b = bsdf_mod.eval_pdf_full(params, wi_l, wo_l,
                                                  types=bsdf_types)
                cand = on_surf & smooth & ls["valid"] & (ls["pdf"] > 0.0)
                sh_o = it["p"] + it["ng"] * jnp.where(
                    jnp.sum(it["ng"] * ls["d"], -1) > 0, RAY_EPS, -RAY_EPS
                )[:, None]
                occ = isect.occluded(scene, sh_o, ls["d"],
                                     ls["dist"] * (1.0 - 1e-3))
                wmis = jnp.where(ls["delta"], 1.0, mi_weight(ls["pdf"], pdf_b))
                li = li + jnp.where(
                    (cand & ~occ)[:, None],
                    thr * f * ls["radiance"]
                    * (wmis / jnp.maximum(ls["pdf"], 1e-20))[:, None],
                    0.0,
                )

            # Cached indirect diffuse: E * albedo / pi.
            e, _ = interpolate(cache, scene, it["p"], it["ns"], grid_res,
                               kappa)
            li = li + jnp.where(
                diffuse_here[:, None],
                thr * params["albedo"] * e * (1.0 / jnp.pi), 0.0,
            )

            # Non-diffuse surfaces (delta AND glossy) continue the path;
            # their indirect light terminates at the next diffuse vertex.
            cont = on_surf & ~_is_diffuse(params)
            u0 = jax.random.uniform(jax.random.fold_in(k, 2), (n_rays,))
            u1b = jax.random.uniform(jax.random.fold_in(k, 3), (n_rays,))
            u2b = jax.random.uniform(jax.random.fold_in(k, 4), (n_rays, 2))
            bs = bsdf_mod.sample_full(params, wi_l, u0, u1b, u2b,
                                      types=bsdf_types)
            wo_w = to_world(s_ax, t_ax, n_ax, bs["wo"])
            good = jnp.any(bs["weight"] > 0.0, axis=-1)
            active = cont & good
            thr = thr * jnp.where(active[:, None], bs["weight"], 1.0)
            off = jnp.where(jnp.sum(it["ng"] * wo_w, -1) > 0, RAY_EPS,
                            -RAY_EPS)
            ro = it["p"] + it["ng"] * off[:, None]
            rd = wo_w
            prev_delta = bs["delta"]
            prev_pdf = bs["pdf"]
        return li

    return trace


def render_irrcache(scene, cfg, spp: int = 16, seed: int = 1234,
                    grid_res: int = 48, gather_res: int = 14,
                    kappa: float = 1.0, indirect_only: bool = False):
    """Overture pass + cached render. Returns renderer.render's dict."""
    from .renderer import render

    cache = build_cache(
        scene, jax.random.PRNGKey(seed ^ 0x5CACE), cfg.width, cfg.height,
        grid_res=grid_res, gather_res=gather_res,
        bsdf_types=cfg.bsdf_types or None, max_depth=cfg.max_depth,
        fov_axis=cfg.fov_axis,
    )
    trace = make_trace_fn(cache, cfg, grid_res, kappa, indirect_only)
    return render(scene, cfg, spp=spp, seed=seed, trace_fn=trace)
