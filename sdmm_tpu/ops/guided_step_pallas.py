"""Fused guided bounce: trace kernel + shade kernel around an XLA leaf fetch.

The guided SDMM integrator cannot run as ONE megakernel: the mixture
conditioning needs the packed leaf rows of the CURRENT hit point, and the
per-lane leaf lookup (dyadic grid gather) + 449-float row gather are XLA
gathers. So the bounce is split exactly at the hit:

  kernel A (trace):  closest-hit sweep + emitter-hit accumulation
                     (MIS weight == 1: the reference's guided tracer
                     compiles NEE out, sdmm_proc.cpp:700,816) + constant-
                     env escape; emits the winner's surface attributes.
  XLA glue:          canonical position -> leaf (grid gather) -> packed
                     conditioning rows (row gather + transpose).
  kernel B (shade):  shading frame, type-dispatched BSDF sample, the
                     guided_tile mixture math (ops/guided_pallas), the
                     one-sample-MIS pdf combine {h, 1-h} with in-kernel
                     diffuse/GGX eval, Russian roulette, film splat rows.

Triangle sweep, BSDF models and table layouts mirror ops/bounce_pallas.py
(same Woop-transform rows, same type codes); the mixture math is
guided_pallas.guided_tile on the same packed-row layout. Semantics mirror
render/guided.py's render_pool_guided body (the XLA pool) so the two are
estimator-identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bounce_pallas import (
    CHUNK, EPS, INF, INV_PI, MAX_UNROLL_TRIS, RAY_EPS,
    T_CONDUCTOR, T_DIELECTRIC, T_DIFFUSE, T_ROUGHCONDUCTOR,
    _ALIVE, _DEPTH_MASK, _DEPTH_SHIFT, _EXH, _PIX_MASK,
    _TAL, _TALP, _TEM, _TETA, _TK, _TNG, _TNS, _TPA, _TSP, _TTY,
    _coordinate_system, _disk_concentric, _dot3, _fresnel_conductor_1,
    _fresnel_dielectric, _ggx_d, _sample_vndf, _smith_g1, _vndf_pdf,
    _woop_tri,
)
from .guided_pallas import N_ROWS, guided_tile

RT = 16  # shade-kernel lane tile (bf16 min tile is (16, 128))
RT_TRACE = 64  # trace-kernel lane tile (matches the unguided megakernel)
HIT_ROWS = 22
# Hit-buffer rows (kernel A -> kernel B):
#  0-2 p, 3-5 ng, 6-8 ns, 9-11 albedo, 12 type, 13 alpha, 14 eta,
#  15-17 k, 18-20 specular, 21 on_surface flag
SPLAT_ROWS = 10  # rgb, rgb^2, done-weight, n_vert, cond_try, cond_ok
RAND_ROWS = 8  # u_sel, lobe_u, b2a, b2b, rr, g_sel, g_r, g_th


def _trace_kernel(n_tris: int, n_cols: int, types: tuple,
                  tile_skip: bool = False):
    chunked = n_tris > MAX_UNROLL_TRIS
    n_chunks = n_cols // CHUNK if chunked else 0
    multi = any(t != T_DIFFUSE for t in types)
    has_cond = T_CONDUCTOR in types
    has_diel = T_DIELECTRIC in types
    has_rc = T_ROUGHCONDUCTOR in types

    def outer(*refs):
        if not tile_skip:
            return kernel(*refs)
        # Whole-tile skip (cost-sorted drain tails): dead tiles pass
        # through at DMA cost — state copied, hit zeroed (on_surface 0).
        alive_ref, rest = refs[0], refs[1:]
        flag = alive_ref[pl.program_id(0)]

        @pl.when(flag == 0)
        def _passthrough():
            rest[4][...] = rest[0][...]  # nstate = state
            rest[5][...] = jnp.zeros_like(rest[5])  # hit

        @pl.when(flag != 0)
        def _run():
            kernel(*rest)

    def kernel(state_ref, meta_ref, tri_ref, env_ref,
               nstate_ref, hit_ref, *maybe_scr):
        scr = maybe_scr[0] if chunked else None
        tri = tri_ref
        rox, roy, roz = state_ref[0], state_ref[1], state_ref[2]
        rdx, rdy, rdz = state_ref[3], state_ref[4], state_ref[5]
        thr_r, thr_g, thr_b = state_ref[6], state_ref[7], state_ref[8]
        li_r, li_g, li_b = state_ref[9], state_ref[10], state_ref[11]
        m = meta_ref[:]
        alive = (m & _ALIVE) != 0

        zeros = jnp.zeros_like(rox)
        ones = jnp.ones_like(rox)

        # ---- Phase 1: closest-hit sweep (winner index only) ----
        def hit_sweep(trs, count, base_f, carry):
            best_t, bu, bv, bj = carry
            for j in range(count):
                t, u, v, okg = _woop_tri(rox, roy, roz, rdx, rdy, rdz, trs, j)
                better = okg & (t > EPS) & (t < best_t)
                best_t = jnp.where(better, t, best_t)
                bu = jnp.where(better, u, bu)
                bv = jnp.where(better, v, bv)
                bj = jnp.where(better, base_f + float(j), bj)
            return best_t, bu, bv, bj

        carry0 = (jnp.full_like(rox, INF), zeros, zeros,
                  jnp.full_like(rox, -1.0))
        if chunked:
            for i, v in enumerate(carry0):
                scr[i] = v

            def hit_chunk(c, _):
                off = pl.multiple_of(c * CHUNK, CHUNK)
                ch = tri[:, pl.ds(off, CHUNK)]
                new = hit_sweep(ch, CHUNK, (c * CHUNK).astype(jnp.float32),
                                tuple(scr[i] for i in range(4)))
                for i in range(4):
                    scr[i] = new[i]
                return 0

            jax.lax.fori_loop(0, n_chunks, hit_chunk, 0)
            best_t, bu, bv, bj = (scr[i] for i in range(4))
        else:
            best_t, bu, bv, bj = hit_sweep(tri, n_tris, 0.0, carry0)

        # ---- Phase 2: winner attribute select ----
        def attr_sweep(trs, count, bj_local, carry):
            (b_ngx, b_ngy, b_ngz, b_nsx, b_nsy, b_nsz,
             b_emr, b_emg, b_emb, b_alr, b_alg, b_alb,
             b_ty, b_alp, b_eta, b_kr, b_kg, b_kb,
             b_sr, b_sg, b_sb) = carry
            w0 = 1.0 - bu - bv
            for j in range(count):
                mm = bj_local == float(j)
                b_ngx = jnp.where(mm, trs[_TNG + 0, j], b_ngx)
                b_ngy = jnp.where(mm, trs[_TNG + 1, j], b_ngy)
                b_ngz = jnp.where(mm, trs[_TNG + 2, j], b_ngz)
                b_nsx = jnp.where(
                    mm, trs[_TNS + 0, j] * w0 + trs[_TNS + 3, j] * bu
                    + trs[_TNS + 6, j] * bv, b_nsx)
                b_nsy = jnp.where(
                    mm, trs[_TNS + 1, j] * w0 + trs[_TNS + 4, j] * bu
                    + trs[_TNS + 7, j] * bv, b_nsy)
                b_nsz = jnp.where(
                    mm, trs[_TNS + 2, j] * w0 + trs[_TNS + 5, j] * bu
                    + trs[_TNS + 8, j] * bv, b_nsz)
                b_emr = jnp.where(mm, trs[_TEM + 0, j], b_emr)
                b_emg = jnp.where(mm, trs[_TEM + 1, j], b_emg)
                b_emb = jnp.where(mm, trs[_TEM + 2, j], b_emb)
                b_alr = jnp.where(mm, trs[_TAL + 0, j], b_alr)
                b_alg = jnp.where(mm, trs[_TAL + 1, j], b_alg)
                b_alb = jnp.where(mm, trs[_TAL + 2, j], b_alb)
                if multi:
                    b_ty = jnp.where(mm, trs[_TTY, j], b_ty)
                if has_rc:
                    b_alp = jnp.where(mm, trs[_TALP, j], b_alp)
                if has_cond or has_diel or has_rc:
                    b_eta = jnp.where(mm, trs[_TETA, j], b_eta)
                    b_sr = jnp.where(mm, trs[_TSP + 0, j], b_sr)
                    b_sg = jnp.where(mm, trs[_TSP + 1, j], b_sg)
                    b_sb = jnp.where(mm, trs[_TSP + 2, j], b_sb)
                if has_cond or has_rc:
                    b_kr = jnp.where(mm, trs[_TK + 0, j], b_kr)
                    b_kg = jnp.where(mm, trs[_TK + 1, j], b_kg)
                    b_kb = jnp.where(mm, trs[_TK + 2, j], b_kb)
            return (b_ngx, b_ngy, b_ngz, b_nsx, b_nsy, b_nsz,
                    b_emr, b_emg, b_emb, b_alr, b_alg, b_alb,
                    b_ty, b_alp, b_eta, b_kr, b_kg, b_kb, b_sr, b_sg, b_sb)

        attrs0 = (zeros, zeros, ones, zeros, zeros, ones,
                  zeros, zeros, zeros, zeros, zeros, zeros,
                  zeros, zeros, ones, zeros, zeros, zeros,
                  ones, ones, ones)
        n_attr = len(attrs0)
        if chunked:
            for i, v in enumerate(attrs0):
                scr[i + 4] = v

            def attr_chunk(c, _):
                off = pl.multiple_of(c * CHUNK, CHUNK)
                ch = tri[:, pl.ds(off, CHUNK)]
                bj_local = bj - (c * CHUNK).astype(jnp.float32)
                new = attr_sweep(ch, CHUNK, bj_local,
                                 tuple(scr[i + 4] for i in range(n_attr)))
                for i in range(n_attr):
                    scr[i + 4] = new[i]
                return 0

            jax.lax.fori_loop(0, n_chunks, attr_chunk, 0)
            attrs = tuple(scr[i + 4] for i in range(n_attr))
        else:
            attrs = attr_sweep(tri, n_tris, bj, attrs0)
        (b_ngx, b_ngy, b_ngz, b_nsx, b_nsy, b_nsz,
         b_emr, b_emg, b_emb, b_alr, b_alg, b_alb,
         b_ty, b_alp, b_eta, b_kr, b_kg, b_kb, b_sr, b_sg, b_sb) = attrs

        hit_valid = best_t < INF
        t_safe = jnp.where(hit_valid, best_t, 0.0)
        px_ = rox + t_safe * rdx
        py_ = roy + t_safe * rdy
        pz_ = roz + t_safe * rdz
        inv_ns = jax.lax.rsqrt(jnp.maximum(
            b_nsx * b_nsx + b_nsy * b_nsy + b_nsz * b_nsz, 1e-20))
        b_nsx = b_nsx * inv_ns
        b_nsy = b_nsy * inv_ns
        b_nsz = b_nsz * inv_ns

        # ---- Emitter hit, MIS weight 1 (guided reference semantics) ----
        cos_l_hit = -_dot3(b_ngx, b_ngy, b_ngz, rdx, rdy, rdz)
        front = cos_l_hit > 0.0
        gain = jnp.where(alive & hit_valid & front, 1.0, 0.0)
        li_r = li_r + thr_r * b_emr * gain
        li_g = li_g + thr_g * b_emg * gain
        li_b = li_b + thr_b * b_emb * gain

        esc = alive & ~hit_valid
        escf = jnp.where(esc, 1.0, 0.0)
        li_r = li_r + thr_r * env_ref[0, 0] * escf
        li_g = li_g + thr_g * env_ref[0, 1] * escf
        li_b = li_b + thr_b * env_ref[0, 2] * escf

        on_surface = alive & hit_valid

        nstate_ref[...] = state_ref[...]
        nstate_ref[9] = li_r
        nstate_ref[10] = li_g
        nstate_ref[11] = li_b
        hit_ref[0] = px_
        hit_ref[1] = py_
        hit_ref[2] = pz_
        hit_ref[3] = b_ngx
        hit_ref[4] = b_ngy
        hit_ref[5] = b_ngz
        hit_ref[6] = b_nsx
        hit_ref[7] = b_nsy
        hit_ref[8] = b_nsz
        hit_ref[9] = b_alr
        hit_ref[10] = b_alg
        hit_ref[11] = b_alb
        hit_ref[12] = b_ty
        hit_ref[13] = b_alp
        hit_ref[14] = b_eta
        hit_ref[15] = b_kr
        hit_ref[16] = b_kg
        hit_ref[17] = b_kb
        hit_ref[18] = b_sr
        hit_ref[19] = b_sg
        hit_ref[20] = b_sb
        hit_ref[21] = jnp.where(on_surface, 1.0, 0.0)

    return outer


def _shade_kernel(types: tuple, max_depth: int, rr_depth: int,
                  bsdf_fraction: float, tile_skip: bool = False):
    multi = any(t != T_DIFFUSE for t in types)
    has_cond = T_CONDUCTOR in types
    has_diel = T_DIELECTRIC in types
    has_rc = T_ROUGHCONDUCTOR in types

    def outer(*refs):
        if not tile_skip:
            return kernel(*refs)
        alive_ref, rest = refs[0], refs[1:]
        flag = alive_ref[pl.program_id(0)]

        @pl.when(flag == 0)
        def _passthrough():
            rest[6][...] = rest[0][...]  # nstate = state
            rest[7][...] = rest[1][...]  # nmeta = meta
            rest[8][...] = jnp.zeros_like(rest[8])  # splat

        @pl.when(flag != 0)
        def _run():
            kernel(*rest)

    def kernel(state_ref, meta_ref, hit_ref, cpos_ref, grows_ref, rand_ref,
               nstate_ref, nmeta_ref, splat_ref):
        rdx, rdy, rdz = state_ref[3], state_ref[4], state_ref[5]
        thr_r, thr_g, thr_b = state_ref[6], state_ref[7], state_ref[8]
        li_r, li_g, li_b = state_ref[9], state_ref[10], state_ref[11]
        eta2 = state_ref[12]
        m = meta_ref[:]
        alive = (m & _ALIVE) != 0
        depth0 = (m >> _DEPTH_SHIFT) & _DEPTH_MASK
        pix = m & _PIX_MASK
        exh = m & _EXH

        px_, py_, pz_ = hit_ref[0], hit_ref[1], hit_ref[2]
        b_ngx, b_ngy, b_ngz = hit_ref[3], hit_ref[4], hit_ref[5]
        b_nsx, b_nsy, b_nsz = hit_ref[6], hit_ref[7], hit_ref[8]
        b_alr, b_alg, b_alb = hit_ref[9], hit_ref[10], hit_ref[11]
        b_ty = hit_ref[12]
        b_alp = hit_ref[13]
        b_eta = hit_ref[14]
        b_kr, b_kg, b_kb = hit_ref[15], hit_ref[16], hit_ref[17]
        b_sr, b_sg, b_sb = hit_ref[18], hit_ref[19], hit_ref[20]
        on_surface = alive & (hit_ref[21] > 0.5)

        ones = jnp.ones_like(px_)
        zeros = jnp.zeros_like(px_)

        is_diff = (b_ty == T_DIFFUSE) if multi else jnp.ones_like(alive)
        is_cond = (b_ty == T_CONDUCTOR) if has_cond else None
        is_diel = (b_ty == T_DIELECTRIC) if has_diel else None
        is_rc = (b_ty == T_ROUGHCONDUCTOR) if has_rc else None

        # ---- Shading frame (flip for non-transmissive; volpath rule) ----
        cos_i_ns = -_dot3(b_nsx, b_nsy, b_nsz, rdx, rdy, rdz)
        if has_diel:
            flip = jnp.where((cos_i_ns < 0.0) & ~is_diel, -1.0, 1.0)
        else:
            flip = jnp.where(cos_i_ns < 0.0, -1.0, 1.0)
        nx = b_nsx * flip
        ny = b_nsy * flip
        nz = b_nsz * flip
        sx, sy, sz, tx_, ty_, tz_ = _coordinate_system(nx, ny, nz)
        wi_z = -_dot3(nx, ny, nz, rdx, rdy, rdz)
        wi_x = -_dot3(sx, sy, sz, rdx, rdy, rdz)
        wi_y = -_dot3(tx_, ty_, tz_, rdx, rdy, rdz)
        wi_dot_geo = -_dot3(b_ngx, b_ngy, b_ngz, rdx, rdy, rdz)
        on_surface = on_surface & ~(wi_dot_geo * wi_z < 0.0)

        delta_only = jnp.zeros_like(alive)
        if has_cond:
            delta_only = delta_only | is_cond
        if has_diel:
            delta_only = delta_only | is_diel

        # ---- BSDF sample (mirrors bounce_pallas core) ----
        dxc, dyc = _disk_concentric(rand_ref[2], rand_ref[3])
        dzc = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxc * dxc - dyc * dyc))
        wo_x, wo_y, wo_z = dxc, dyc, dzc
        w_r, w_g, w_b = b_alr, b_alg, b_alb
        good = (b_alr > 0.0) | (b_alg > 0.0) | (b_alb > 0.0)
        sampled_delta = jnp.zeros_like(alive)
        eta_factor = ones

        if has_cond:
            f_cr = _fresnel_conductor_1(wi_z, b_eta, b_kr)
            f_cg = _fresnel_conductor_1(wi_z, b_eta, b_kg)
            f_cb = _fresnel_conductor_1(wi_z, b_eta, b_kb)
            wo_x = jnp.where(is_cond, -wi_x, wo_x)
            wo_y = jnp.where(is_cond, -wi_y, wo_y)
            wo_z = jnp.where(is_cond, wi_z, wo_z)
            w_r = jnp.where(is_cond, b_sr * f_cr, w_r)
            w_g = jnp.where(is_cond, b_sg * f_cg, w_g)
            w_b = jnp.where(is_cond, b_sb * f_cb, w_b)
            good = jnp.where(is_cond, (f_cr > 0) | (f_cg > 0) | (f_cb > 0),
                             good)
            sampled_delta = sampled_delta | is_cond

        if has_diel:
            fr, cos_t, eta_it, eta_ti = _fresnel_dielectric(wi_z, b_eta)
            refl = rand_ref[1] < fr
            wo_dx = jnp.where(refl, -wi_x, -wi_x * eta_ti)
            wo_dy = jnp.where(refl, -wi_y, -wi_y * eta_ti)
            wo_dz = jnp.where(refl, wi_z, cos_t)
            w_dr = jnp.where(refl, b_sr, b_alr * eta_ti * eta_ti)
            w_dg = jnp.where(refl, b_sg, b_alg * eta_ti * eta_ti)
            w_db = jnp.where(refl, b_sb, b_alb * eta_ti * eta_ti)
            wo_x = jnp.where(is_diel, wo_dx, wo_x)
            wo_y = jnp.where(is_diel, wo_dy, wo_y)
            wo_z = jnp.where(is_diel, wo_dz, wo_z)
            w_r = jnp.where(is_diel, w_dr, w_r)
            w_g = jnp.where(is_diel, w_dg, w_g)
            w_b = jnp.where(is_diel, w_db, w_b)
            good = jnp.where(is_diel, (w_dr > 0) | (w_dg > 0) | (w_db > 0),
                             good)
            sampled_delta = sampled_delta | is_diel
            eta_factor = jnp.where(is_diel & ~refl, eta_it, eta_factor)

        if has_rc:
            mxv, myv, mzv = _sample_vndf(wi_x, wi_y, wi_z, b_alp,
                                         rand_ref[2], rand_ref[3])
            widm = _dot3(wi_x, wi_y, wi_z, mxv, myv, mzv)
            wo_rx = 2.0 * widm * mxv - wi_x
            wo_ry = 2.0 * widm * myv - wi_y
            wo_rz = 2.0 * widm * mzv - wi_z
            ok_r = wo_rz > 1e-6
            wo_x = jnp.where(is_rc, wo_rx, wo_x)
            wo_y = jnp.where(is_rc, wo_ry, wo_y)
            wo_z = jnp.where(is_rc, wo_rz, wo_z)
            good = jnp.where(is_rc, ok_r, good)

        # BSDF-sampled direction in world space.
        wbx = sx * wo_x + tx_ * wo_y + nx * wo_z
        wby = sy * wo_x + ty_ * wo_y + ny * wo_z
        wbz = sz * wo_x + tz_ * wo_y + nz * wo_z

        # ---- Guided mixture: conditional sample + pdf at both dirs ----
        gx, gy, gz, g_ok, pdf_g, pdf_b, cond_valid, ginit = guided_tile(
            lambda j: grows_ref[j].astype(jnp.float32),
            cpos_ref[0], cpos_ref[1], cpos_ref[2],
            wbx, wby, wbz,
            rand_ref[5], rand_ref[6], rand_ref[7],
        )
        guide_valid = cond_valid & ginit
        guide_ok = guide_valid & ~delta_only
        h = jnp.where(guide_ok, bsdf_fraction, 1.0)
        take_bsdf = (rand_ref[0] < h) | ~guide_ok

        # Conditional counters (reference avgFoundConditional).
        cond_try = on_surface & ginit & ~delta_only
        cond_ok_ct = cond_try & cond_valid

        # Chosen direction, world + local.
        wox = jnp.where(take_bsdf, wbx, gx)
        woy = jnp.where(take_bsdf, wby, gy)
        woz = jnp.where(take_bsdf, wbz, gz)
        wg_lx = _dot3(sx, sy, sz, gx, gy, gz)
        wg_ly = _dot3(tx_, ty_, tz_, gx, gy, gz)
        wg_lz = _dot3(nx, ny, nz, gx, gy, gz)
        wl_x = jnp.where(take_bsdf, wo_x, wg_lx)
        wl_y = jnp.where(take_bsdf, wo_y, wg_ly)
        wl_z = jnp.where(take_bsdf, wo_z, wg_lz)
        sampled_delta = take_bsdf & sampled_delta

        # ---- f(wi, wo) and bsdf pdf at the chosen direction (smooth) ----
        cos_o = jnp.maximum(wl_z, 0.0)
        f_ev_r = jnp.where(is_diff, b_alr * (INV_PI * cos_o), 0.0) \
            if multi else b_alr * (INV_PI * cos_o)
        f_ev_g = jnp.where(is_diff, b_alg * (INV_PI * cos_o), 0.0) \
            if multi else b_alg * (INV_PI * cos_o)
        f_ev_b = jnp.where(is_diff, b_alb * (INV_PI * cos_o), 0.0) \
            if multi else b_alb * (INV_PI * cos_o)
        pdf_ev = jnp.where(is_diff, cos_o * INV_PI, 0.0) \
            if multi else cos_o * INV_PI
        if has_rc:
            hx = wi_x + wl_x
            hy = wi_y + wl_y
            hz = wi_z + wl_z
            inv_h = jax.lax.rsqrt(jnp.maximum(
                hx * hx + hy * hy + hz * hz, 1e-20))
            hx, hy, hz = hx * inv_h, hy * inv_h, hz * inv_h
            widoth = _dot3(wi_x, wi_y, wi_z, hx, hy, hz)
            d_h = _ggx_d(hz, b_alp)
            g_h = (_smith_g1(wi_x, wi_y, wi_z, hx, hy, hz, b_alp)
                   * _smith_g1(wl_x, wl_y, wl_z, hx, hy, hz, b_alp))
            both = (wi_z > 1e-6) & (wl_z > 1e-6)
            spec = jnp.where(
                both, d_h * g_h / jnp.maximum(4.0 * wi_z, 1e-12), 0.0)
            pdf_rc = jnp.where(
                both,
                _vndf_pdf(wi_x, wi_y, wi_z, hx, hy, hz, b_alp)
                / jnp.maximum(
                    4.0 * jnp.abs(_dot3(wl_x, wl_y, wl_z, hx, hy, hz)),
                    1e-12),
                0.0,
            )
            f_ev_r = jnp.where(
                is_rc, b_sr * _fresnel_conductor_1(widoth, b_eta, b_kr)
                * spec, f_ev_r)
            f_ev_g = jnp.where(
                is_rc, b_sg * _fresnel_conductor_1(widoth, b_eta, b_kg)
                * spec, f_ev_g)
            f_ev_b = jnp.where(
                is_rc, b_sb * _fresnel_conductor_1(widoth, b_eta, b_kb)
                * spec, f_ev_b)
            pdf_ev = jnp.where(is_rc, pdf_rc, pdf_ev)

        gmm_pdf = jnp.where(guide_ok, jnp.where(take_bsdf, pdf_b, pdf_g),
                            0.0)
        mis_pdf = h * pdf_ev + (1.0 - h) * gmm_pdf

        inv_mis = 1.0 / jnp.maximum(mis_pdf, 1e-20)
        inv_h = 1.0 / jnp.maximum(h, 1e-6)
        bw_r = jnp.where(sampled_delta, w_r * inv_h, f_ev_r * inv_mis)
        bw_g = jnp.where(sampled_delta, w_g * inv_h, f_ev_g * inv_mis)
        bw_b = jnp.where(sampled_delta, w_b * inv_h, f_ev_b * inv_mis)
        ok_sample = jnp.where(
            sampled_delta,
            good,
            (mis_pdf > 0.0)
            & ((f_ev_r > 0.0) | (f_ev_g > 0.0) | (f_ev_b > 0.0))
            & (take_bsdf | g_ok),
        )
        wo_dot_geo = _dot3(b_ngx, b_ngy, b_ngz, wox, woy, woz)
        ok_sample = ok_sample & ~(wo_dot_geo * wl_z <= 0.0)

        depth = depth0 + 1
        survive = on_surface & ok_sample & (depth < max_depth)
        thr_nr = thr_r * jnp.where(survive, bw_r, 1.0)
        thr_ng = thr_g * jnp.where(survive, bw_g, 1.0)
        thr_nb = thr_b * jnp.where(survive, bw_b, 1.0)
        eta2_n = eta2 * jnp.where(survive, eta_factor * eta_factor, 1.0)

        q = jnp.minimum(
            jnp.maximum(jnp.maximum(thr_nr, thr_ng), thr_nb) * eta2_n, 0.95)
        do_rr = (depth + 1) >= rr_depth
        survive = survive & ~(do_rr & (rand_ref[4] >= q))
        rr_boost = jnp.where(do_rr & survive,
                             1.0 / jnp.maximum(q, 1e-6), 1.0)
        thr_nr = thr_nr * rr_boost
        thr_ng = thr_ng * rr_boost
        thr_nb = thr_nb * rr_boost

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
        splat_ref[8] = jnp.where(cond_try, 1.0, 0.0)
        splat_ref[9] = jnp.where(cond_ok_ct, 1.0, 0.0)

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
        nstate_ref[12] = eta2_n
        nstate_ref[13] = zeros
        nstate_ref[14] = zeros
        nstate_ref[15] = zeros

        depth_packed = jnp.where(survive, depth, 0) & _DEPTH_MASK
        nmeta_ref[:] = (
            pix
            | (depth_packed << _DEPTH_SHIFT)
            | jnp.where(survive, _ALIVE, 0)
            | exh
        )

    return outer


def trace_rt(r: int, n_tris: int) -> int:
    """The lane-tile height trace() will use for an [.., R, 128] wave —
    callers building tile_alive flags must match this granularity."""
    chunked = n_tris > MAX_UNROLL_TRIS
    rt = RT if chunked else RT_TRACE
    while r % rt:
        rt //= 2
    return rt


@partial(jax.jit, static_argnames=("n_tris", "types", "interpret"))
def trace(state, meta, tri_rows, env_row, n_tris: int, types: tuple,
          interpret: bool = False, tile_alive=None):
    """Kernel A: intersect + emitter accumulate. state [16, R, 128] f32,
    meta [R, 128] i32. Returns (new_state, hit [HIT_ROWS, R, 128]).
    ``tile_alive`` (optional [R // trace_rt(R)] i32): whole-tile skip."""
    r = state.shape[1]
    chunked = n_tris > MAX_UNROLL_TRIS
    n_cols = tri_rows.shape[1]
    rt = trace_rt(r, n_tris)
    assert rt >= RT, (r, rt)
    grid = (r // rt,)
    scratch = [pltpu.VMEM((26, rt, 128), jnp.float32)] if chunked else []
    tile_skip = tile_alive is not None
    skip_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if tile_skip else []
    skip_args = (tile_alive.astype(jnp.int32),) if tile_skip else ()
    return pl.pallas_call(
        _trace_kernel(n_tris, n_cols, tuple(types), tile_skip=tile_skip),
        grid=grid,
        scratch_shapes=scratch,
        in_specs=skip_specs + [
            pl.BlockSpec((16, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HIT_ROWS, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct((HIT_ROWS, r, 128), jnp.float32),
        ],
        input_output_aliases={len(skip_args): 0},
        interpret=interpret,
    )(*skip_args, state, meta, tri_rows, env_row)


@partial(jax.jit, static_argnames=(
    "types", "max_depth", "rr_depth", "bsdf_fraction", "interpret",
))
def shade(state, meta, hit, cpos, grows, rand, types: tuple,
          max_depth: int, rr_depth: int, bsdf_fraction: float,
          interpret: bool = False, tile_alive=None):
    """Kernel B: guided + BSDF shading. grows [N_ROWS, R, 128] packed
    conditioning rows; cpos [3, R, 128] canonical hit positions; rand
    [RAND_ROWS, R, 128]. Returns (new_state, new_meta,
    splat [SPLAT_ROWS, R, 128]).
    ``tile_alive`` (optional [R // RT] i32): whole-tile skip."""
    r = state.shape[1]
    assert r % RT == 0
    grid = (r // RT,)
    tile_skip = tile_alive is not None
    skip_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if tile_skip else []
    skip_args = (tile_alive.astype(jnp.int32),) if tile_skip else ()
    return pl.pallas_call(
        _shade_kernel(tuple(types), max_depth, rr_depth, bsdf_fraction,
                      tile_skip=tile_skip),
        grid=grid,
        in_specs=skip_specs + [
            pl.BlockSpec((16, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HIT_ROWS, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_ROWS, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAND_ROWS, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SPLAT_ROWS, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct(meta.shape, jnp.int32),
            jax.ShapeDtypeStruct((SPLAT_ROWS, r, 128), jnp.float32),
        ],
        input_output_aliases={len(skip_args): 0, len(skip_args) + 1: 1},
        interpret=interpret,
    )(*skip_args, state, meta, hit, cpos, grows, rand)
