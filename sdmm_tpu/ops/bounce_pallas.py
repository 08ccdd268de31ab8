"""Pallas TPU megakernel: one full path-tracing bounce per call.

PERF.md's profile of the wavefront pool showed the bounce body dominated
by XLA materializing [rays x tris] intersection intermediates in HBM plus
a long tail of memory-space copies between fusions; a partial Pallas
intersection kernel LOST end-to-end because it broke XLA's cross-op
fusion (see ops/intersect_pallas.py docstring). The fix is to leave XLA
nothing to fuse: this kernel runs the whole bounce — closest-hit sweep,
emitter-hit MIS, next-event estimation with its occlusion sweep, diffuse
BSDF sampling, Russian roulette, state update — in one pallas_call, so
the only HBM traffic per bounce is lane state in and lane state out.

Layout: lane state is [16, R, 128] (attribute-major; a lane tile is an
[RT, 128] block using all 8 VPU sublanes), triangles are attribute-major
[32, T] rows read as scalars inside a fully unrolled triangle loop
(static indices — no gathers anywhere). Per-triangle work is ~56 vector
ops on [RT, 128] tiles; nothing ray x triangle ever exists outside VMEM
registers.

Scope (host-gated in render/wavefront.py): diffuse-only scenes without
textures/media/envmap-NEE and <= MAX_UNROLL_TRIS triangles — the
reference's headline cornell-box benchmark path. Wider BSDF coverage
falls back to the XLA pool.

Semantics mirror render/wavefront.py's bounce body exactly (which in
turn mirrors the reference integrator: mitsuba/src/integrators/path/
volpath.cpp with NEE, RR at sdmm_proc.cpp:858).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38
EPS = 1e-6  # intersect.EPS
RAY_EPS = 1e-4  # volpath.RAY_EPS
INV_PI = 0.3183098861837907
PI = 3.141592653589793

# Meta bit layout — must match render/wavefront.py.
_DEPTH_SHIFT = 20
_ALIVE = 1 << 24
_EXH = 1 << 25
_PDELTA = 1 << 26
_PIX_MASK = (1 << 20) - 1
_DEPTH_MASK = 0xF

RT = 64  # sublane rows per lane tile -> RT*128 = 8192 lanes/tile
MAX_UNROLL_TRIS = 96

# Triangle row indices in the [32, T] attribute-major table.
_TV = 0  # 0-8: v0.xyz, e1.xyz, e2.xyz
_TNG = 9  # 9-11: geometric normal
_TNS = 12  # 12-20: vertex shading normals n0.xyz n1.xyz n2.xyz
_TEM = 21  # 21-23: emitted radiance rgb
_TPA = 24  # 24: NEE selection pdf / area (0 for non-emitters)
_TAL = 25  # 25-27: diffuse albedo rgb
TRI_ROWS = 32

# Emitter row indices in the [18, E] table.
_ECDF = 0
_EV = 1  # 1-9: v0/e1/e2
_ENG = 10  # 10-12
_ERAD = 13  # 13-15
_EPA = 16  # selection pdf / area
EM_ROWS = 18


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _mi_weight(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0.0, a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-32), 0.0)


def _mt_tri(rox, roy, roz, rdx, rdy, rdz, tri, j):
    """Möller–Trumbore of all lanes against (static) triangle j.

    Returns (t, u, v, ok_geo) where ok_geo excludes the t-range test.
    """
    v0x, v0y, v0z = tri[_TV + 0, j], tri[_TV + 1, j], tri[_TV + 2, j]
    e1x, e1y, e1z = tri[_TV + 3, j], tri[_TV + 4, j], tri[_TV + 5, j]
    e2x, e2y, e2z = tri[_TV + 6, j], tri[_TV + 7, j], tri[_TV + 8, j]
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = rox - v0x
    ty = roy - v0y
    tz = roz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


def _coordinate_system(nx, ny, nz):
    """Duff et al. branchless ONB — mirrors core/frame.coordinate_system."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    sx = 1.0 + sign * nx * nx * a
    sy = sign * b
    sz = -sign * nx
    tx = b
    ty = sign + ny * ny * a
    tz = -ny
    return sx, sy, sz, tx, ty, tz


def _disk_concentric(u0, u1):
    """Shirley concentric square->disk — mirrors core/warp."""
    ox = 2.0 * u0 - 1.0
    oy = 2.0 * u1 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    cond = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(cond, ox, oy)
    safe_div = jnp.where(
        cond,
        jnp.where(ox != 0.0, oy / jnp.where(ox == 0.0, 1.0, ox), 0.0),
        jnp.where(oy != 0.0, ox / jnp.where(oy == 0.0, 1.0, oy), 0.0),
    )
    theta = jnp.where(
        cond, (PI / 4.0) * safe_div, (PI / 2.0) - (PI / 4.0) * safe_div
    )
    r = jnp.where(zero, 0.0, r)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _bounce_kernel(n_tris: int, n_em: int, max_depth: int, rr_depth: int):
    def kernel(state_ref, meta_ref, rand_ref, tri_ref, em_ref, env_ref,
               nstate_ref, nmeta_ref, splat_ref):
        tri = tri_ref  # scalar static reads only
        em = em_ref

        rox, roy, roz = state_ref[0], state_ref[1], state_ref[2]
        rdx, rdy, rdz = state_ref[3], state_ref[4], state_ref[5]
        thr_r, thr_g, thr_b = state_ref[6], state_ref[7], state_ref[8]
        li_r, li_g, li_b = state_ref[9], state_ref[10], state_ref[11]
        eta2 = state_ref[12]
        ppdf = state_ref[13]

        m = meta_ref[:]
        alive = (m & _ALIVE) != 0
        prev_delta = (m & _PDELTA) != 0
        depth0 = (m >> _DEPTH_SHIFT) & _DEPTH_MASK
        pix = m & _PIX_MASK
        exh = m & _EXH

        # ---- Closest-hit sweep with inline winner-attribute selection ----
        best_t = jnp.full_like(rox, INF)
        b_ngx = jnp.zeros_like(rox)
        b_ngy = jnp.zeros_like(rox)
        b_ngz = jnp.ones_like(rox)
        b_nsx = jnp.zeros_like(rox)
        b_nsy = jnp.zeros_like(rox)
        b_nsz = jnp.ones_like(rox)
        b_emr = jnp.zeros_like(rox)
        b_emg = jnp.zeros_like(rox)
        b_emb = jnp.zeros_like(rox)
        b_pa = jnp.zeros_like(rox)
        b_alr = jnp.zeros_like(rox)
        b_alg = jnp.zeros_like(rox)
        b_alb = jnp.zeros_like(rox)
        for j in range(n_tris):
            t, u, v, okg = _mt_tri(rox, roy, roz, rdx, rdy, rdz, tri, j)
            better = okg & (t > EPS) & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            w0 = 1.0 - u - v
            b_ngx = jnp.where(better, tri[_TNG + 0, j], b_ngx)
            b_ngy = jnp.where(better, tri[_TNG + 1, j], b_ngy)
            b_ngz = jnp.where(better, tri[_TNG + 2, j], b_ngz)
            b_nsx = jnp.where(
                better,
                tri[_TNS + 0, j] * w0 + tri[_TNS + 3, j] * u + tri[_TNS + 6, j] * v,
                b_nsx,
            )
            b_nsy = jnp.where(
                better,
                tri[_TNS + 1, j] * w0 + tri[_TNS + 4, j] * u + tri[_TNS + 7, j] * v,
                b_nsy,
            )
            b_nsz = jnp.where(
                better,
                tri[_TNS + 2, j] * w0 + tri[_TNS + 5, j] * u + tri[_TNS + 8, j] * v,
                b_nsz,
            )
            b_emr = jnp.where(better, tri[_TEM + 0, j], b_emr)
            b_emg = jnp.where(better, tri[_TEM + 1, j], b_emg)
            b_emb = jnp.where(better, tri[_TEM + 2, j], b_emb)
            b_pa = jnp.where(better, tri[_TPA, j], b_pa)
            b_alr = jnp.where(better, tri[_TAL + 0, j], b_alr)
            b_alg = jnp.where(better, tri[_TAL + 1, j], b_alg)
            b_alb = jnp.where(better, tri[_TAL + 2, j], b_alb)

        hit_valid = best_t < INF
        t_safe = jnp.where(hit_valid, best_t, 0.0)
        px_ = rox + t_safe * rdx
        py_ = roy + t_safe * rdy
        pz_ = roz + t_safe * rdz
        inv_ns = jax.lax.rsqrt(
            jnp.maximum(b_nsx * b_nsx + b_nsy * b_nsy + b_nsz * b_nsz, 1e-20)
        )
        b_nsx = b_nsx * inv_ns
        b_nsy = b_nsy * inv_ns
        b_nsz = b_nsz * inv_ns

        # ---- Emitter hit (MIS vs the previous bounce's BSDF pdf) ----
        cos_l_hit = -_dot3(b_ngx, b_ngy, b_ngz, rdx, rdy, rdz)
        front = cos_l_hit > 0.0
        pdf_nee_hit = jnp.where(
            hit_valid & (cos_l_hit > 1e-6),
            b_pa * best_t * best_t / jnp.maximum(cos_l_hit, 1e-12),
            0.0,
        )
        w_hit = jnp.where(prev_delta, 1.0, _mi_weight(ppdf, pdf_nee_hit))
        gain = jnp.where(alive & hit_valid & front, w_hit, 0.0)
        li_r = li_r + thr_r * b_emr * gain
        li_g = li_g + thr_g * b_emg * gain
        li_b = li_b + thr_b * b_emb * gain

        # Escaped rays: constant environment (w_env = 1; no env NEE here).
        esc = alive & ~hit_valid
        escf = jnp.where(esc, 1.0, 0.0)
        li_r = li_r + thr_r * env_ref[0, 0] * escf
        li_g = li_g + thr_g * env_ref[0, 1] * escf
        li_b = li_b + thr_b * env_ref[0, 2] * escf

        on_surface = alive & hit_valid

        # ---- Shading frame (implicit twosided for diffuse) ----
        cos_i_ns = -_dot3(b_nsx, b_nsy, b_nsz, rdx, rdy, rdz)
        flip = jnp.where(cos_i_ns < 0.0, -1.0, 1.0)
        nx = b_nsx * flip
        ny = b_nsy * flip
        nz = b_nsz * flip
        sx, sy, sz, tx_, ty_, tz_ = _coordinate_system(nx, ny, nz)
        wi_z = -_dot3(nx, ny, nz, rdx, rdy, rdz)
        wi_dot_geo = -_dot3(b_ngx, b_ngy, b_ngz, rdx, rdy, rdz)
        on_surface = on_surface & ~(wi_dot_geo * wi_z < 0.0)

        # ---- NEE: sample one emissive triangle by CDF ----
        u1 = rand_ref[0]
        su0 = jnp.sqrt(rand_ref[1])
        bb0 = 1.0 - su0
        bb1 = rand_ref[2] * su0
        e_yx = jnp.zeros_like(rox)
        e_yy = jnp.zeros_like(rox)
        e_yz = jnp.zeros_like(rox)
        e_nx = jnp.zeros_like(rox)
        e_ny = jnp.zeros_like(rox)
        e_nz = jnp.ones_like(rox)
        e_rr = jnp.zeros_like(rox)
        e_rg = jnp.zeros_like(rox)
        e_rb = jnp.zeros_like(rox)
        e_pa = jnp.zeros_like(rox)
        picked = jnp.zeros_like(alive)
        for e in range(n_em):
            pick = ~picked & ((em[_ECDF, e] >= u1) | (e == n_em - 1))
            picked = picked | pick
            yx = em[_EV + 0, e] + bb0 * em[_EV + 3, e] + bb1 * em[_EV + 6, e]
            yy = em[_EV + 1, e] + bb0 * em[_EV + 4, e] + bb1 * em[_EV + 7, e]
            yz = em[_EV + 2, e] + bb0 * em[_EV + 5, e] + bb1 * em[_EV + 8, e]
            e_yx = jnp.where(pick, yx, e_yx)
            e_yy = jnp.where(pick, yy, e_yy)
            e_yz = jnp.where(pick, yz, e_yz)
            e_nx = jnp.where(pick, em[_ENG + 0, e], e_nx)
            e_ny = jnp.where(pick, em[_ENG + 1, e], e_ny)
            e_nz = jnp.where(pick, em[_ENG + 2, e], e_nz)
            e_rr = jnp.where(pick, em[_ERAD + 0, e], e_rr)
            e_rg = jnp.where(pick, em[_ERAD + 1, e], e_rg)
            e_rb = jnp.where(pick, em[_ERAD + 2, e], e_rb)
            e_pa = jnp.where(pick, em[_EPA, e], e_pa)

        tox = e_yx - px_
        toy = e_yy - py_
        toz = e_yz - pz_
        dist2 = tox * tox + toy * toy + toz * toz
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        inv_dist = 1.0 / dist
        ldx = tox * inv_dist
        ldy = toy * inv_dist
        ldz = toz * inv_dist
        cos_l = -_dot3(e_nx, e_ny, e_nz, ldx, ldy, ldz)
        pdf_sa = e_pa * dist2 / jnp.maximum(cos_l, 1e-12)
        nee_valid = (cos_l > 1e-6) & (dist2 > 1e-12)
        pdf_sa = jnp.where(nee_valid, pdf_sa, 0.0)

        wo_l_z = _dot3(nx, ny, nz, ldx, ldy, ldz)
        cos_o = jnp.maximum(wo_l_z, 0.0)
        pdf_b_nee = cos_o * INV_PI
        cand = on_surface & nee_valid & (pdf_sa > 0.0)

        off = jnp.where(
            _dot3(b_ngx, b_ngy, b_ngz, ldx, ldy, ldz) > 0, RAY_EPS, -RAY_EPS
        )
        shx = px_ + b_ngx * off
        shy = py_ + b_ngy * off
        shz = pz_ + b_ngz * off
        t_lim = dist * (1.0 - 1e-3)
        occ = jnp.zeros_like(alive)
        for j in range(n_tris):
            t, _, _, okg = _mt_tri(shx, shy, shz, ldx, ldy, ldz, tri, j)
            occ = occ | (okg & (t > EPS) & (t < t_lim))

        w_nee = _mi_weight(pdf_sa, pdf_b_nee)
        scale = jnp.where(
            cand & ~occ,
            INV_PI * cos_o * w_nee / jnp.maximum(pdf_sa, 1e-20),
            0.0,
        )
        li_r = li_r + thr_r * b_alr * e_rr * scale
        li_g = li_g + thr_g * b_alg * e_rg * scale
        li_b = li_b + thr_b * b_alb * e_rb * scale

        # ---- Diffuse BSDF sample (cosine hemisphere) ----
        dx, dy = _disk_concentric(rand_ref[3], rand_ref[4])
        dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
        pdf_s = dz * INV_PI
        wox = sx * dx + tx_ * dy + nx * dz
        woy = sy * dx + ty_ * dy + ny * dz
        woz = sz * dx + tz_ * dy + nz * dz
        wo_dot_geo = _dot3(b_ngx, b_ngy, b_ngz, wox, woy, woz)
        good = (
            ((b_alr > 0.0) | (b_alg > 0.0) | (b_alb > 0.0))
            & ~(wo_dot_geo * dz <= 0.0)
        )

        depth = depth0 + 1
        survive = on_surface & good & (depth < max_depth)
        sf = jnp.where(survive, 1.0, 0.0)
        thr_nr = thr_r * jnp.where(survive, b_alr, 1.0)
        thr_ng = thr_g * jnp.where(survive, b_alg, 1.0)
        thr_nb = thr_b * jnp.where(survive, b_alb, 1.0)

        # Russian roulette (reference: sdmm_proc.cpp:858).
        q = jnp.minimum(
            jnp.maximum(jnp.maximum(thr_nr, thr_ng), thr_nb) * eta2, 0.95
        )
        do_rr = (depth + 1) >= rr_depth
        u_rr = rand_ref[5]
        survive = survive & ~(do_rr & (u_rr >= q))
        rr_boost = jnp.where(
            do_rr & survive, 1.0 / jnp.maximum(q, 1e-6), 1.0
        )
        thr_nr = thr_nr * rr_boost
        thr_ng = thr_ng * rr_boost
        thr_nb = thr_nb * rr_boost

        # ---- Splat finished paths ----
        done = alive & ~survive
        df = jnp.where(done, 1.0, 0.0)
        ls_r = jnp.where(jnp.isfinite(li_r), li_r, 0.0) * df
        ls_g = jnp.where(jnp.isfinite(li_g), li_g, 0.0) * df
        ls_b = jnp.where(jnp.isfinite(li_b), li_b, 0.0) * df
        splat_ref[0] = ls_r
        splat_ref[1] = ls_g
        splat_ref[2] = ls_b
        splat_ref[3] = ls_r * ls_r
        splat_ref[4] = ls_g * ls_g
        splat_ref[5] = ls_b * ls_b
        splat_ref[6] = df
        splat_ref[7] = jnp.where(on_surface, 1.0, 0.0)

        # ---- Next state ----
        off2 = jnp.where(wo_dot_geo > 0, RAY_EPS, -RAY_EPS)
        nstate_ref[0] = px_ + b_ngx * off2
        nstate_ref[1] = py_ + b_ngy * off2
        nstate_ref[2] = pz_ + b_ngz * off2
        nstate_ref[3] = wox
        nstate_ref[4] = woy
        nstate_ref[5] = woz
        nstate_ref[6] = thr_nr
        nstate_ref[7] = thr_ng
        nstate_ref[8] = thr_nb
        nstate_ref[9] = li_r
        nstate_ref[10] = li_g
        nstate_ref[11] = li_b
        nstate_ref[12] = eta2
        nstate_ref[13] = pdf_s
        nstate_ref[14] = jnp.zeros_like(rox)
        nstate_ref[15] = jnp.zeros_like(rox)

        depth_packed = jnp.where(survive, depth, 0) & _DEPTH_MASK
        nmeta_ref[:] = (
            pix
            | (depth_packed << _DEPTH_SHIFT)
            | jnp.where(survive, _ALIVE, 0)
            | exh
        )

    return kernel


@partial(jax.jit, static_argnames=(
    "n_tris", "n_em", "max_depth", "rr_depth", "interpret",
))
def diffuse_bounce(state, meta, rand, tri_rows, em_rows, env_row,
                   n_tris: int, n_em: int, max_depth: int, rr_depth: int,
                   interpret: bool = False):
    """One bounce for all lanes.

    state [16, R, 128] f32, meta [R, 128] i32, rand [6, R, 128] f32,
    tri_rows [32, T] f32, em_rows [18, E] f32, env_row [1, 128] f32.
    R must be a multiple of RT. Returns (new_state, new_meta, splat[8,R,128]).
    """
    r = state.shape[1]
    assert r % RT == 0, (r, RT)
    assert n_tris <= MAX_UNROLL_TRIS
    grid = (r // RT,)
    return pl.pallas_call(
        _bounce_kernel(n_tris, n_em, max_depth, rr_depth),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct(meta.shape, jnp.int32),
            jax.ShapeDtypeStruct((8, r, 128), jnp.float32),
        ],
        interpret=interpret,
    )(state, meta, rand, tri_rows, em_rows, env_row)


def build_tables(scene):
    """Host/trace-time packing of the scene into kernel tables.

    Returns (tri_rows [32, T], em_rows [18, E], env_row [1, 128]).
    """
    t = scene.tri_v0.shape[0]
    tri = jnp.zeros((TRI_ROWS, t))
    tri = tri.at[_TV + 0:_TV + 3].set(scene.tri_v0.T)
    tri = tri.at[_TV + 3:_TV + 6].set(scene.tri_e1.T)
    tri = tri.at[_TV + 6:_TV + 9].set(scene.tri_e2.T)
    tri = tri.at[_TNG:_TNG + 3].set(scene.tri_ng.T)
    ns = scene.tri_ns.reshape(t, 9).T  # n0.xyz n1.xyz n2.xyz
    tri = tri.at[_TNS:_TNS + 9].set(ns)
    em_id = scene.tri_emitter
    rad = jnp.where(
        (em_id >= 0)[:, None],
        scene.emitter_radiance[jnp.maximum(em_id, 0)],
        0.0,
    )
    tri = tri.at[_TEM:_TEM + 3].set(rad.T)
    from ..scene import emitters as em_mod

    tri = tri.at[_TPA].set(em_mod.tri_pdf_over_area(scene))
    albedo = scene.bsdf_albedo[scene.tri_bsdf]
    tri = tri.at[_TAL:_TAL + 3].set(albedo.T)

    m = scene.em_tri_idx.shape[0]
    if m:
        idx = scene.em_tri_idx
        em = jnp.zeros((EM_ROWS, m))
        em = em.at[_ECDF].set(scene.em_tri_cdf)
        em = em.at[_EV + 0:_EV + 3].set(scene.tri_v0[idx].T)
        em = em.at[_EV + 3:_EV + 6].set(scene.tri_e1[idx].T)
        em = em.at[_EV + 6:_EV + 9].set(scene.tri_e2[idx].T)
        em = em.at[_ENG:_ENG + 3].set(scene.tri_ng[idx].T)
        em = em.at[_ERAD:_ERAD + 3].set(
            scene.emitter_radiance[scene.tri_emitter[idx]].T
        )
        em = em.at[_EPA].set(
            scene.em_tri_pdf / jnp.maximum(scene.em_tri_area, 1e-20)
        )
    else:
        em = jnp.zeros((EM_ROWS, 1))
    env = jnp.zeros((1, 128)).at[0, 0:3].set(
        jnp.broadcast_to(scene.env_radiance, (3,))
    )
    return tri, em, env
