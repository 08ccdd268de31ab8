"""Pallas TPU megakernel: one full path-tracing bounce per call.

PERF.md's profile of the wavefront pool showed the bounce body dominated
by XLA materializing [rays x tris] intersection intermediates in HBM plus
a long tail of memory-space copies between fusions; a partial Pallas
intersection kernel LOST end-to-end because it broke XLA's cross-op
fusion (see ops/intersect_pallas.py docstring). The fix is to leave XLA
nothing to fuse: this kernel runs the whole bounce — closest-hit sweep,
emitter-hit MIS, next-event estimation with its occlusion sweep, BSDF
sampling, Russian roulette, state update — in one pallas_call, so the
only HBM traffic per bounce is lane state in and lane state out.

Layout: lane state is [16, R, 128] (attribute-major; a lane tile is an
[RT, 128] block using all 8 VPU sublanes), triangles are attribute-major
[40, T] rows read as scalars inside a fully unrolled triangle loop
(static indices — no gathers anywhere). Per-triangle work is ~60 vector
ops on [RT, 128] tiles; nothing ray x triangle ever exists outside VMEM
registers.

BSDF coverage (statically specialized on the scene's type set, like the
wavefront pool's ``bsdf_types``): diffuse, smooth conductor, smooth
dielectric, rough conductor (GGX VNDF). Host-gated in
render/wavefront.py: untextured area-light scenes without media and
<= MAX_UNROLL_TRIS triangles. Everything else falls back to the XLA pool.

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

# BSDF type codes handled in-kernel (must match scene.py).
T_DIFFUSE = 0
T_CONDUCTOR = 1
T_DIELECTRIC = 2
T_ROUGHCONDUCTOR = 3
SUPPORTED_TYPES = (T_DIFFUSE, T_CONDUCTOR, T_DIELECTRIC, T_ROUGHCONDUCTOR)

# Meta bit layout — must match render/wavefront.py.
_DEPTH_SHIFT = 20
_ALIVE = 1 << 24
_EXH = 1 << 25
_PDELTA = 1 << 26
_PIX_MASK = (1 << 20) - 1
_DEPTH_MASK = 0xF

RT = 64  # sublane rows per lane tile -> RT*128 = 8192 lanes/tile
# Chunked mode uses smaller lane tiles: the scratch-resident sweep state
# plus Mosaic's spill stack scale with the tile and overflow the 16 MB
# VMEM budget at RT=64.
RT_CHUNKED = 16
MAX_UNROLL_TRIS = 96
# Larger scenes stream the triangle table through a fori_loop over
# lane-aligned CHUNK-column slices of the in-VMEM table instead of a
# fully unrolled sweep (bounded compile time, same register-resident
# winner-attribute selection).
CHUNK = 128
MAX_TRIS = 4096

# Triangle row indices in the [43, T] attribute-major table.
# Rows 0-11 hold the Woop affine precompute instead of raw vertices
# (the same precomputed-transform move as the reference's Wald TriAccel,
# mitsuba/include/mitsuba/render/triaccel.h): B = [e1 e2 n]^-1 row-major,
# c = -B·v0, so o' = B·ro + c, d' = B·rd, t = -o'_z/d'_z,
# (u, v) = (o'_xy + t·d'_xy) are exact barycentrics. ~30% fewer sweep ops
# than Möller–Trumbore and no per-pair cross products.
_TW = 0  # 0-8: B row-major; 9-11: c
_TNG = 12  # 12-14: geometric normal
_TNS = 15  # 15-23: vertex shading normals n0.xyz n1.xyz n2.xyz
_TEM = 24  # 24-26: emitted radiance rgb
_TPA = 27  # 27: NEE selection pdf / area (0 for non-emitters)
_TAL = 28  # 28-30: diffuse albedo rgb
_TTY = 31  # bsdf type code (as f32)
_TALP = 32  # GGX roughness
_TETA = 33  # ior / conductor eta (scalar)
_TK = 34  # 34-36: conductor absorption k rgb
_TSP = 37  # 37-39: specular reflectance rgb
TRI_ROWS = 43

# Emitter row indices in the [18, E] table.
_ECDF = 0
_EV = 1  # 1-9: v0/e1/e2
_ENG = 10  # 10-12
_ERAD = 13  # 13-15
_EPA = 16  # selection pdf / area
EM_ROWS = 18

# rand rows: nee_u1, nee_u2a, nee_u2b, lobe_u1, b2a, b2b, rr, spare.
RAND_ROWS = 8


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _mi_weight(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0.0, a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-32), 0.0)


def _woop_tri(rox, roy, roz, rdx, rdy, rdz, tri, j):
    """Woop-transform intersection of all lanes against (static) tri j.

    `tri` is either the [43, T] VMEM ref (unrolled mode) or a loaded
    [43, CHUNK] register chunk (chunked mode); j is always static.
    Returns (t, u, v, ok_geo) where ok_geo excludes the t-range test.
    Degenerate/padding triangles have all-zero rows -> d'_z = 0 -> ok False.
    """
    b0, b1, b2 = tri[_TW + 0, j], tri[_TW + 1, j], tri[_TW + 2, j]
    b3, b4, b5 = tri[_TW + 3, j], tri[_TW + 4, j], tri[_TW + 5, j]
    b6, b7, b8 = tri[_TW + 6, j], tri[_TW + 7, j], tri[_TW + 8, j]
    c0, c1, c2 = tri[_TW + 9, j], tri[_TW + 10, j], tri[_TW + 11, j]
    dpz = b6 * rdx + b7 * rdy + b8 * rdz
    opz = b6 * rox + b7 * roy + b8 * roz + c2
    good = jnp.abs(dpz) > 1e-12
    inv = jnp.where(good, 1.0 / jnp.where(good, dpz, 1.0), 0.0)
    t = -opz * inv
    u = (b0 * rox + b1 * roy + b2 * roz + c0) + t * (
        b0 * rdx + b1 * rdy + b2 * rdz
    )
    v = (b3 * rox + b4 * roy + b5 * roz + c1) + t * (
        b3 * rdx + b4 * rdy + b5 * rdz
    )
    ok = good & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
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


def _fresnel_dielectric(cos_i, eta):
    """Mirrors bsdf/fresnel.fresnel_dielectric (scalar eta per lane)."""
    outside = cos_i >= 0.0
    rcp = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp)
    eta_ti = jnp.where(outside, rcp, eta)
    cos_t2 = 1.0 - eta_ti * eta_ti * (1.0 - cos_i * cos_i)
    aci = jnp.abs(cos_i)
    cos_t = jnp.sqrt(jnp.maximum(cos_t2, 0.0))
    rs = (aci - eta_it * cos_t) / jnp.maximum(aci + eta_it * cos_t, 1e-12)
    rp = (eta_it * aci - cos_t) / jnp.maximum(eta_it * aci + cos_t, 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    f = jnp.where(cos_t2 <= 0.0, 1.0, f)
    cos_t = jnp.where(cos_t2 <= 0.0, 0.0, -jnp.sign(cos_i) * cos_t)
    return f, cos_t, eta_it, eta_ti


def _fresnel_conductor_1(cos_i, eta, k):
    """One channel of bsdf/fresnel.fresnel_conductor."""
    c2 = cos_i * cos_i
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * jnp.abs(cos_i)
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def _ggx_d(mz, alpha):
    cos_t = jnp.maximum(mz, 0.0)
    a2 = alpha * alpha
    den = cos_t * cos_t * (a2 - 1.0) + 1.0
    return jnp.where(cos_t > 0.0, a2 / jnp.maximum(PI * den * den, 1e-20), 0.0)


def _smith_g1(vx, vy, vz, mx, my, mz, alpha):
    chi = _dot3(vx, vy, vz, mx, my, mz) * vz > 0.0
    cos2 = vz * vz
    tan2 = jnp.maximum(1.0 - cos2, 0.0) / jnp.maximum(cos2, 1e-12)
    lam = 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)
    return jnp.where(chi, 1.0 / (1.0 + lam), 0.0)


def _sample_vndf(wix, wiy, wiz, alpha, u0, u1):
    """Heitz VNDF sampling, scalarized (mirrors bsdf/microfacet.py)."""
    vx = alpha * wix
    vy = alpha * wiy
    vz = wiz
    inv = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-20))
    vx, vy, vz = vx * inv, vy * inv, vz * inv
    lensq = vx * vx + vy * vy
    inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    big = lensq > 1e-12
    t1x = jnp.where(big, -vy * inv_len, 1.0)
    t1y = jnp.where(big, vx * inv_len, 0.0)
    t1z = jnp.zeros_like(vx)
    # t2 = v x t1
    t2x = vy * t1z - vz * t1y
    t2y = vz * t1x - vx * t1z
    t2z = vx * t1y - vy * t1x
    r = jnp.sqrt(jnp.maximum(u0, 0.0))
    phi = 2.0 * PI * u1
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vz)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nx = p1 * t1x + p2 * t2x + p3 * vx
    ny = p1 * t1y + p2 * t2y + p3 * vy
    nz = p1 * t1z + p2 * t2z + p3 * vz
    mx = alpha * nx
    my = alpha * ny
    mz = jnp.maximum(nz, 0.0)
    inv_m = jax.lax.rsqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-20))
    return mx * inv_m, my * inv_m, mz * inv_m


def _vndf_pdf(wix, wiy, wiz, mx, my, mz, alpha):
    g1 = _smith_g1(wix, wiy, wiz, mx, my, mz, alpha)
    d = _ggx_d(mz, alpha)
    return g1 * jnp.abs(_dot3(wix, wiy, wiz, mx, my, mz)) * d / jnp.maximum(
        jnp.abs(wiz), 1e-12
    )


def _bounce_kernel(n_tris: int, n_cols: int, n_em: int, max_depth: int,
                   rr_depth: int, types: tuple, tile_skip: bool = False):
    chunked = n_tris > MAX_UNROLL_TRIS
    n_chunks = n_cols // CHUNK if chunked else 0
    multi = any(t != T_DIFFUSE for t in types)
    has_cond = T_CONDUCTOR in types
    has_diel = T_DIELECTRIC in types
    has_rc = T_ROUGHCONDUCTOR in types
    has_diff = T_DIFFUSE in types

    def kernel(*refs):
        if tile_skip:
            # Whole-tile skip: the striped pool's drain tail leaves entire
            # lane tiles dead-and-exhausted; those tiles pass through
            # (state copy, zero splat) at DMA cost only — no sweep.
            alive_ref, refs = refs[0], refs[1:]
            state_ref, meta_ref = refs[0], refs[1]
            nstate_ref, nmeta_ref, splat_ref = refs[6], refs[7], refs[8]
            flag = alive_ref[pl.program_id(0)]

            @pl.when(flag == 0)
            def _passthrough():
                nstate_ref[...] = state_ref[...]
                nmeta_ref[...] = meta_ref[...]
                splat_ref[...] = jnp.zeros_like(splat_ref)

            @pl.when(flag != 0)
            def _run():
                _bounce_body(*refs)
        else:
            _bounce_body(*refs)

    def _bounce_body(state_ref, meta_ref, rand_ref, tri_ref, em_ref, env_ref,
                     nstate_ref, nmeta_ref, splat_ref, *maybe_scr):
        scr = maybe_scr[0] if chunked else None
        sv = [state_ref[i] for i in range(14)]
        rnd = [rand_ref[i] for i in range(7)]
        ns, nm, sp = core(sv, meta_ref[:], rnd, tri_ref, em_ref, env_ref, scr)
        for i in range(14):
            nstate_ref[i] = ns[i]
        nstate_ref[14] = jnp.zeros_like(ns[0])
        nstate_ref[15] = jnp.zeros_like(ns[0])
        nmeta_ref[:] = nm
        for i in range(8):
            splat_ref[i] = sp[i]

    core = _make_core(n_tris, n_cols, n_em, max_depth, rr_depth, types)
    return kernel


def _make_core(n_tris: int, n_cols: int, n_em: int, max_depth: int,
               rr_depth: int, types: tuple):
    """The bounce physics as a pure register-value function: sv = 14 lane
    state rows, m = meta, rand = 7 uniform rows; returns (14 next-state
    rows, next meta, 8 splat rows). Shared by the plain bounce kernel and
    the fused step kernel."""
    chunked = n_tris > MAX_UNROLL_TRIS
    n_chunks = n_cols // CHUNK if chunked else 0
    multi = any(t != T_DIFFUSE for t in types)
    has_cond = T_CONDUCTOR in types
    has_diel = T_DIELECTRIC in types
    has_rc = T_ROUGHCONDUCTOR in types

    def _bounce_core(sv, m, rand, tri_ref, em_ref, env_ref, scr):
        # Chunked mode carries the sweep state in VMEM scratch rather than
        # as lax.fori_loop iter_args: Mosaic cannot legalize scf.for with
        # two dozen large vector loop-carried values.
        tri = tri_ref  # scalar static reads only
        em = em_ref

        (rox, roy, roz, rdx, rdy, rdz, thr_r, thr_g, thr_b,
         li_r, li_g, li_b, eta2, ppdf) = sv
        alive = (m & _ALIVE) != 0
        prev_delta = (m & _PDELTA) != 0
        depth0 = (m >> _DEPTH_SHIFT) & _DEPTH_MASK
        pix = m & _PIX_MASK
        exh = m & _EXH

        # ---- Phase 1: closest-hit sweep, winner index only ----
        # Carrying just (t, u, v, j) through the sweep keeps 4 live vector
        # registers instead of 23 winner attributes — the 23-carry version
        # spilled to VMEM on every triangle iteration (Mosaic register
        # pressure), dominating kernel time.
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

        zeros = jnp.zeros_like(rox)
        ones = jnp.ones_like(rox)
        carry0 = (jnp.full_like(rox, INF), zeros, zeros,
                  jnp.full_like(rox, -1.0))
        if chunked:
            for i, v in enumerate(carry0):
                scr[i] = v

            def hit_chunk(c, _):
                off = pl.multiple_of(c * CHUNK, CHUNK)
                ch = tri[:, pl.ds(off, CHUNK)]
                base_f = (c * CHUNK).astype(jnp.float32)
                new = hit_sweep(ch, CHUNK, base_f,
                                tuple(scr[i] for i in range(4)))
                for i in range(4):
                    scr[i] = new[i]
                return 0

            jax.lax.fori_loop(0, n_chunks, hit_chunk, 0)
            best_t, bu, bv, bj = (scr[i] for i in range(4))
        else:
            best_t, bu, bv, bj = hit_sweep(tri, n_tris, 0.0, carry0)

        # ---- Phase 2: gather the winner's attributes by index match ----
        def attr_sweep(trs, count, bj_local, carry):
            """Select attributes where the (rebased) winner index equals j."""
            (b_ngx, b_ngy, b_ngz, b_nsx, b_nsy, b_nsz,
             b_emr, b_emg, b_emb, b_pa, b_alr, b_alg, b_alb,
             b_ty, b_alp, b_eta, b_kr, b_kg, b_kb, b_sr, b_sg, b_sb) = carry
            w0 = 1.0 - bu - bv
            for j in range(count):
                m = bj_local == float(j)
                b_ngx = jnp.where(m, trs[_TNG + 0, j], b_ngx)
                b_ngy = jnp.where(m, trs[_TNG + 1, j], b_ngy)
                b_ngz = jnp.where(m, trs[_TNG + 2, j], b_ngz)
                b_nsx = jnp.where(
                    m,
                    trs[_TNS + 0, j] * w0 + trs[_TNS + 3, j] * bu
                    + trs[_TNS + 6, j] * bv,
                    b_nsx,
                )
                b_nsy = jnp.where(
                    m,
                    trs[_TNS + 1, j] * w0 + trs[_TNS + 4, j] * bu
                    + trs[_TNS + 7, j] * bv,
                    b_nsy,
                )
                b_nsz = jnp.where(
                    m,
                    trs[_TNS + 2, j] * w0 + trs[_TNS + 5, j] * bu
                    + trs[_TNS + 8, j] * bv,
                    b_nsz,
                )
                b_emr = jnp.where(m, trs[_TEM + 0, j], b_emr)
                b_emg = jnp.where(m, trs[_TEM + 1, j], b_emg)
                b_emb = jnp.where(m, trs[_TEM + 2, j], b_emb)
                b_pa = jnp.where(m, trs[_TPA, j], b_pa)
                b_alr = jnp.where(m, trs[_TAL + 0, j], b_alr)
                b_alg = jnp.where(m, trs[_TAL + 1, j], b_alg)
                b_alb = jnp.where(m, trs[_TAL + 2, j], b_alb)
                if multi:
                    b_ty = jnp.where(m, trs[_TTY, j], b_ty)
                if has_rc:
                    b_alp = jnp.where(m, trs[_TALP, j], b_alp)
                if has_cond or has_diel or has_rc:
                    b_eta = jnp.where(m, trs[_TETA, j], b_eta)
                    b_sr = jnp.where(m, trs[_TSP + 0, j], b_sr)
                    b_sg = jnp.where(m, trs[_TSP + 1, j], b_sg)
                    b_sb = jnp.where(m, trs[_TSP + 2, j], b_sb)
                if has_cond or has_rc:
                    b_kr = jnp.where(m, trs[_TK + 0, j], b_kr)
                    b_kg = jnp.where(m, trs[_TK + 1, j], b_kg)
                    b_kb = jnp.where(m, trs[_TK + 2, j], b_kb)
            return (b_ngx, b_ngy, b_ngz, b_nsx, b_nsy, b_nsz,
                    b_emr, b_emg, b_emb, b_pa, b_alr, b_alg, b_alb,
                    b_ty, b_alp, b_eta, b_kr, b_kg, b_kb, b_sr, b_sg, b_sb)

        attrs0 = (
            zeros, zeros, ones,       # ng
            zeros, zeros, ones,       # ns
            zeros, zeros, zeros,      # em
            zeros,                    # pa
            zeros, zeros, zeros,      # albedo
            zeros,                    # type
            zeros,                    # alpha
            ones,                     # eta
            zeros, zeros, zeros,      # k
            ones, ones, ones,         # specular
        )
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
         b_emr, b_emg, b_emb, b_pa, b_alr, b_alg, b_alb,
         b_ty, b_alp, b_eta, b_kr, b_kg, b_kb, b_sr, b_sg, b_sb) = attrs

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

        is_diff = (b_ty == T_DIFFUSE) if multi else jnp.ones_like(alive)
        is_cond = (b_ty == T_CONDUCTOR) if has_cond else None
        is_diel = (b_ty == T_DIELECTRIC) if has_diel else None
        is_rc = (b_ty == T_ROUGHCONDUCTOR) if has_rc else None

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

        # ---- Shading frame (flip for non-transmissive; volpath rule) ----
        cos_i_ns = -_dot3(b_nsx, b_nsy, b_nsz, rdx, rdy, rdz)
        if has_diel:
            transmissive = is_diel
            flip = jnp.where((cos_i_ns < 0.0) & ~transmissive, -1.0, 1.0)
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

        # Lane smoothness: NEE targets only non-delta lobes.
        smooth = is_diff
        if has_rc:
            smooth = smooth | is_rc

        # ---- NEE: sample one emissive triangle by CDF ----
        u1 = rand[0]
        su0 = jnp.sqrt(rand[1])
        bb0 = 1.0 - su0
        bb1 = rand[2] * su0
        e_yx, e_yy, e_yz = zeros, zeros, zeros
        e_nx, e_ny = zeros, zeros
        e_nz = ones
        e_rr, e_rg, e_rb = zeros, zeros, zeros
        e_pa = zeros
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

        # f(wi, wo_nee) and its pdf for the smooth lobes.
        wo_l_z = _dot3(nx, ny, nz, ldx, ldy, ldz)
        cos_o = jnp.maximum(wo_l_z, 0.0)
        f_nee_r = jnp.where(is_diff, b_alr * (INV_PI * cos_o), 0.0) \
            if multi else b_alr * (INV_PI * cos_o)
        f_nee_g = jnp.where(is_diff, b_alg * (INV_PI * cos_o), 0.0) \
            if multi else b_alg * (INV_PI * cos_o)
        f_nee_b = jnp.where(is_diff, b_alb * (INV_PI * cos_o), 0.0) \
            if multi else b_alb * (INV_PI * cos_o)
        pdf_b_nee = jnp.where(is_diff, cos_o * INV_PI, 0.0) \
            if multi else cos_o * INV_PI
        if has_rc:
            # GGX reflection eval (mirrors bsdf.py roughconductor branch).
            wo_l_x = _dot3(sx, sy, sz, ldx, ldy, ldz)
            wo_l_y = _dot3(tx_, ty_, tz_, ldx, ldy, ldz)
            hx = wi_x + wo_l_x
            hy = wi_y + wo_l_y
            hz = wi_z + wo_l_z
            inv_h = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz,
                                              1e-20))
            hx, hy, hz = hx * inv_h, hy * inv_h, hz * inv_h
            widoth = _dot3(wi_x, wi_y, wi_z, hx, hy, hz)
            d_h = _ggx_d(hz, b_alp)
            g_h = (_smith_g1(wi_x, wi_y, wi_z, hx, hy, hz, b_alp)
                   * _smith_g1(wo_l_x, wo_l_y, wo_l_z, hx, hy, hz, b_alp))
            both = (wi_z > 1e-6) & (wo_l_z > 1e-6)
            spec = jnp.where(both, d_h * g_h / jnp.maximum(4.0 * wi_z, 1e-12),
                             0.0)
            f_rc_r = b_sr * _fresnel_conductor_1(widoth, b_eta, b_kr) * spec
            f_rc_g = b_sg * _fresnel_conductor_1(widoth, b_eta, b_kg) * spec
            f_rc_b = b_sb * _fresnel_conductor_1(widoth, b_eta, b_kb) * spec
            pdf_rc_nee = jnp.where(
                both,
                _vndf_pdf(wi_x, wi_y, wi_z, hx, hy, hz, b_alp)
                / jnp.maximum(4.0 * jnp.abs(
                    _dot3(wo_l_x, wo_l_y, wo_l_z, hx, hy, hz)), 1e-12),
                0.0,
            )
            f_nee_r = jnp.where(is_rc, f_rc_r, f_nee_r)
            f_nee_g = jnp.where(is_rc, f_rc_g, f_nee_g)
            f_nee_b = jnp.where(is_rc, f_rc_b, f_nee_b)
            pdf_b_nee = jnp.where(is_rc, pdf_rc_nee, pdf_b_nee)

        # Gate NEE by maxDepth: its light vertex sits at depth0+2
        # (reference volpath.cpp breaks before NEE once depth >= maxDepth).
        cand = (
            on_surface & smooth & nee_valid & (pdf_sa > 0.0)
            & (depth0 + 2 <= max_depth)
        )

        off = jnp.where(
            _dot3(b_ngx, b_ngy, b_ngz, ldx, ldy, ldz) > 0, RAY_EPS, -RAY_EPS
        )
        shx = px_ + b_ngx * off
        shy = py_ + b_ngy * off
        shz = pz_ + b_ngz * off
        t_lim = dist * (1.0 - 1e-3)

        def occ_sweep(trs, count, occ):
            for j in range(count):
                t, _, _, okg = _woop_tri(shx, shy, shz, ldx, ldy, ldz, trs, j)
                occ = occ | (okg & (t > EPS) & (t < t_lim))
            return occ

        if chunked:
            # Phases 1/2 are done; reuse scratch slot 0 for the mask.
            scr[0] = jnp.zeros_like(rox)

            def occ_chunk(c, _):
                off = pl.multiple_of(c * CHUNK, CHUNK)
                o = occ_sweep(tri[:, pl.ds(off, CHUNK)], CHUNK,
                              scr[0] > 0.0)
                scr[0] = jnp.where(o, 1.0, 0.0)
                return 0

            jax.lax.fori_loop(0, n_chunks, occ_chunk, 0)
            occ = scr[0] > 0.0
        else:
            occ = occ_sweep(tri, n_tris, jnp.zeros_like(alive))

        w_nee = _mi_weight(pdf_sa, pdf_b_nee)
        scale = jnp.where(
            cand & ~occ, w_nee / jnp.maximum(pdf_sa, 1e-20), 0.0
        )
        li_r = li_r + thr_r * f_nee_r * e_rr * scale
        li_g = li_g + thr_g * f_nee_g * e_rg * scale
        li_b = li_b + thr_b * f_nee_b * e_rb * scale

        # ---- BSDF sample (type-dispatched, statically specialized) ----
        # Diffuse: cosine hemisphere.
        dxc, dyc = _disk_concentric(rand[4], rand[5])
        dzc = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxc * dxc - dyc * dyc))
        wo_x, wo_y, wo_z = dxc, dyc, dzc
        pdf_s = dzc * INV_PI
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
            pdf_s = jnp.where(is_cond, 1.0, pdf_s)
            # Pure-i1 blend: jnp.where on bool vectors lowers to an
            # i8->i1 arith.trunci that Mosaic rejects ("Unsupported
            # target bitwidth for truncation").
            good = (good & ~is_cond) | (
                is_cond & ((f_cr > 0) | (f_cg > 0) | (f_cb > 0)))
            sampled_delta = sampled_delta | is_cond

        if has_diel:
            fr, cos_t, eta_it, eta_ti = _fresnel_dielectric(wi_z, b_eta)
            refl = rand[3] < fr
            # reflect: (-x, -y, z); refract: (-x*eta_ti, -y*eta_ti, cos_t).
            wo_dx = jnp.where(refl, -wi_x, -wi_x * eta_ti)
            wo_dy = jnp.where(refl, -wi_y, -wi_y * eta_ti)
            wo_dz = jnp.where(refl, wi_z, cos_t)
            # Radiance transport: transmitted scaled by eta_ti^2
            # (albedo column = specularTransmittance for dielectrics).
            w_dr = jnp.where(refl, b_sr, b_alr * eta_ti * eta_ti)
            w_dg = jnp.where(refl, b_sg, b_alg * eta_ti * eta_ti)
            w_db = jnp.where(refl, b_sb, b_alb * eta_ti * eta_ti)
            wo_x = jnp.where(is_diel, wo_dx, wo_x)
            wo_y = jnp.where(is_diel, wo_dy, wo_y)
            wo_z = jnp.where(is_diel, wo_dz, wo_z)
            w_r = jnp.where(is_diel, w_dr, w_r)
            w_g = jnp.where(is_diel, w_dg, w_g)
            w_b = jnp.where(is_diel, w_db, w_b)
            pdf_s = jnp.where(is_diel, jnp.where(refl, fr, 1.0 - fr), pdf_s)
            good = (good & ~is_diel) | (
                is_diel & ((w_dr > 0) | (w_dg > 0) | (w_db > 0)))
            sampled_delta = sampled_delta | is_diel
            eta_factor = jnp.where(is_diel & ~refl, eta_it, eta_factor)

        if has_rc:
            mx, my, mz = _sample_vndf(wi_x, wi_y, wi_z, b_alp,
                                      rand[4], rand[5])
            widm = _dot3(wi_x, wi_y, wi_z, mx, my, mz)
            wo_rx = 2.0 * widm * mx - wi_x
            wo_ry = 2.0 * widm * my - wi_y
            wo_rz = 2.0 * widm * mz - wi_z
            g1o = _smith_g1(wo_rx, wo_ry, wo_rz, mx, my, mz, b_alp)
            w_rr_ = b_sr * _fresnel_conductor_1(widm, b_eta, b_kr) * g1o
            w_rg_ = b_sg * _fresnel_conductor_1(widm, b_eta, b_kg) * g1o
            w_rb_ = b_sb * _fresnel_conductor_1(widm, b_eta, b_kb) * g1o
            pdf_r = _vndf_pdf(wi_x, wi_y, wi_z, mx, my, mz, b_alp) \
                / jnp.maximum(4.0 * jnp.abs(
                    _dot3(wo_rx, wo_ry, wo_rz, mx, my, mz)), 1e-12)
            ok_r = wo_rz > 1e-6
            wo_x = jnp.where(is_rc, wo_rx, wo_x)
            wo_y = jnp.where(is_rc, wo_ry, wo_y)
            wo_z = jnp.where(is_rc, wo_rz, wo_z)
            w_r = jnp.where(is_rc, jnp.where(ok_r, w_rr_, 0.0), w_r)
            w_g = jnp.where(is_rc, jnp.where(ok_r, w_rg_, 0.0), w_g)
            w_b = jnp.where(is_rc, jnp.where(ok_r, w_rb_, 0.0), w_b)
            pdf_s = jnp.where(is_rc, jnp.where(ok_r, pdf_r, 0.0), pdf_s)
            good = (good & ~is_rc) | (
                is_rc & ok_r & ((w_rr_ > 0) | (w_rg_ > 0) | (w_rb_ > 0)))

        # Local -> world.
        wox = sx * wo_x + tx_ * wo_y + nx * wo_z
        woy = sy * wo_x + ty_ * wo_y + ny * wo_z
        woz = sz * wo_x + tz_ * wo_y + nz * wo_z
        wo_dot_geo = _dot3(b_ngx, b_ngy, b_ngz, wox, woy, woz)
        good = good & ~(wo_dot_geo * wo_z <= 0.0)

        depth = depth0 + 1
        survive = on_surface & good & (depth < max_depth)
        thr_nr = thr_r * jnp.where(survive, w_r, 1.0)
        thr_ng = thr_g * jnp.where(survive, w_g, 1.0)
        thr_nb = thr_b * jnp.where(survive, w_b, 1.0)
        eta2_n = eta2 * jnp.where(survive, eta_factor * eta_factor, 1.0)

        # Russian roulette (reference: sdmm_proc.cpp:858).
        q = jnp.minimum(
            jnp.maximum(jnp.maximum(thr_nr, thr_ng), thr_nb) * eta2_n, 0.95
        )
        do_rr = (depth + 1) >= rr_depth
        u_rr = rand[6]
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
        splat = [ls_r, ls_g, ls_b, ls_r * ls_r, ls_g * ls_g,
                 ls_b * ls_b, df, jnp.where(on_surface, 1.0, 0.0)]

        # ---- Next state ----
        off2 = jnp.where(wo_dot_geo > 0, RAY_EPS, -RAY_EPS)
        nstate = [px_ + b_ngx * off2, py_ + b_ngy * off2,
                  pz_ + b_ngz * off2, wox, woy, woz,
                  thr_nr, thr_ng, thr_nb, li_r, li_g, li_b,
                  eta2_n, pdf_s]

        depth_packed = jnp.where(survive, depth, 0) & _DEPTH_MASK
        nmeta = (
            pix
            | (depth_packed << _DEPTH_SHIFT)
            | jnp.where(survive, _ALIVE, 0)
            | jnp.where(sampled_delta, _PDELTA, 0)
            | exh
        )
        return nstate, nmeta, splat

    return _bounce_core


def _step_kernel(n_tris: int, n_cols: int, n_em: int, max_depth: int,
                 rr_depth: int, types: tuple, width: int, height: int,
                 in_kernel_rng: bool):
    """Fully-fused pool step: regenerate dead lanes on their assigned
    pixel (camera ray gen in-kernel), run one bounce, and accumulate the
    film — all in one pallas_call with state/meta/film aliased in-place.

    Motivation (PERF.md round-2): on the virtualized v5e the XLA glue
    around the bounce kernel (regen selects, camera rays, threefry rand,
    film adds) moves ~40 MB/step at ~270 GB/s — more than the bounce
    itself once tiles start skipping. Fusing it leaves XLA only a 1 MB
    meta reduction per step. Random numbers come from the TPU PRNG
    (pltpu.prng_random_bits, seeded per (phase, step, tile)); interpret
    mode has no PRNG lowering, so tests pass host rand instead.
    """
    chunked = n_tris > MAX_UNROLL_TRIS
    core = _make_core(n_tris, n_cols, n_em, max_depth, rr_depth, types)
    inv_w = 1.0 / width
    inv_h = 1.0 / height

    def kernel(*refs):
        alive_ref, cam_ref, seed_ref, pxpy_ref = refs[0:4]
        state_ref, meta_ref, film_ref = refs[4:7]
        if in_kernel_rng:
            tri_ref, em_ref, env_ref = refs[7:10]
            out0 = 10
        else:
            rand_ref, tri_ref, em_ref, env_ref = refs[7:11]
            out0 = 11
        nstate_ref, nmeta_ref, nfilm_ref = refs[out0:out0 + 3]
        maybe_scr = refs[out0 + 3:]
        scr = maybe_scr[0] if chunked else None
        flag = alive_ref[pl.program_id(0)]

        @pl.when(flag == 0)
        def _skip():
            nstate_ref[...] = state_ref[...]
            nmeta_ref[...] = meta_ref[...]
            nfilm_ref[...] = film_ref[...]

        @pl.when(flag != 0)
        def _run():
            if in_kernel_rng:
                # Mosaic allows at most 2 seed words: fold the tile id in.
                pltpu.prng_seed(
                    # golden-ratio mix, 0x9E3779B9 as signed i32
                    seed_ref[0] ^ (pl.program_id(0) * jnp.int32(-1640531527)),
                    seed_ref[1],
                )
                shape = (RAND_ROWS + 2,) + state_ref.shape[1:]
                bits = jax.lax.bitcast_convert_type(
                    pltpu.prng_random_bits(shape), jnp.int32
                )
                # Top 24 bits as a uniform in [0, 1); Mosaic has no
                # uint32->f32 cast, so mask after an arithmetic shift.
                rnd = [
                    ((bits[i] >> 8) & 0xFFFFFF).astype(jnp.float32)
                    * (1.0 / 16777216.0)
                    for i in range(RAND_ROWS + 2)
                ]
            else:
                rnd = [rand_ref[i] for i in range(RAND_ROWS + 2)]

            # --- Regenerate dead lanes on their assigned pixel ---
            m = meta_ref[:]
            alive = (m & _ALIVE) != 0
            exh = (m & _EXH) != 0
            count = (m & _PIX_MASK).astype(jnp.float32)
            need = ~alive & ~exh
            start = need & (count < pxpy_ref[2])
            exh = exh | (need & ~start)
            count = jnp.where(start, count + 1.0, count)
            px = pxpy_ref[0] + rnd[RAND_ROWS]
            py = pxpy_ref[1] + rnd[RAND_ROWS + 1]
            # Perspective camera (mirrors scene/sensor.generate_rays).
            sx = 1.0 - 2.0 * px * inv_w
            sy = 1.0 - 2.0 * py * inv_h
            dcx = sx * cam_ref[12]
            dcy = sy * cam_ref[13]
            dx = cam_ref[0] * dcx + cam_ref[1] * dcy + cam_ref[2]
            dy = cam_ref[3] * dcx + cam_ref[4] * dcy + cam_ref[5]
            dz = cam_ref[6] * dcx + cam_ref[7] * dcy + cam_ref[8]
            inv_n = jax.lax.rsqrt(
                jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
            )
            ones = jnp.ones_like(px)
            zeros = jnp.zeros_like(px)
            fresh = [cam_ref[9] * ones, cam_ref[10] * ones, cam_ref[11] * ones,
                     dx * inv_n, dy * inv_n, dz * inv_n,
                     ones, ones, ones, zeros, zeros, zeros, ones, ones]
            sv = [jnp.where(start, f, state_ref[i])
                  for i, f in enumerate(fresh)]
            m2 = (
                count.astype(jnp.int32)
                | jnp.where(alive | start, _ALIVE, 0)
                | jnp.where(exh, _EXH, 0)
                | jnp.where(start, _PDELTA, m & _PDELTA)
                | jnp.where(start, 0, m & (_DEPTH_MASK << _DEPTH_SHIFT))
            )

            ns, nm, sp = core(sv, m2, rnd[:7], tri_ref, em_ref, env_ref, scr)
            for i in range(14):
                nstate_ref[i] = ns[i]
            nstate_ref[14] = zeros
            nstate_ref[15] = zeros
            nmeta_ref[:] = nm
            for i in range(8):
                nfilm_ref[i] = film_ref[i] + sp[i]

    return kernel


@partial(jax.jit, static_argnames=(
    "n_tris", "n_em", "max_depth", "rr_depth", "types", "width", "height",
    "interpret",
))
def step(state, meta, film, tile_alive, cam, seed2, pxpy,
         tri_rows, em_rows, env_row,
         n_tris: int, n_em: int, max_depth: int, rr_depth: int,
         types: tuple, width: int, height: int,
         interpret: bool = False, rand=None):
    """One fused pool step (regen + bounce + film) for all lanes.

    state [16, R, 128] f32 / meta [R, 128] i32 / film [8, R, 128] f32 are
    donated and updated in place (input_output_aliases). tile_alive
    [R // RT] i32 skips drained tiles; cam [14] f32 = rot row-major(9) +
    origin(3) + tan_x + tan_y; seed2 [2] i32 = (phase seed, step); pxpy
    [3, R, 128] f32 = pixel x, pixel y, per-lane sample budget. `rand`
    ([RAND_ROWS+2, R, 128]) replaces the in-kernel PRNG under interpret.
    Returns (state, meta, film).
    """
    r = state.shape[1]
    assert n_tris <= MAX_TRIS
    n_cols = tri_rows.shape[1]
    if n_tris > MAX_UNROLL_TRIS:
        assert n_cols % CHUNK == 0, n_cols
    chunked = n_tris > MAX_UNROLL_TRIS
    rt = RT_CHUNKED if chunked else RT
    assert r % rt == 0, (r, rt)
    grid = (r // rt,)
    scratch = [pltpu.VMEM((26, rt, 128), jnp.float32)] if chunked else []
    in_kernel_rng = rand is None
    rand_args = () if in_kernel_rng else (rand,)
    rand_specs = [] if in_kernel_rng else [
        pl.BlockSpec((RAND_ROWS + 2, rt, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    return pl.pallas_call(
        _step_kernel(n_tris, n_cols, n_em, max_depth, rr_depth,
                     tuple(types), width, height, in_kernel_rng),
        grid=grid,
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_alive
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed2
            pl.BlockSpec((3, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),  # pxpy
            pl.BlockSpec((16, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + rand_specs + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct(meta.shape, jnp.int32),
            jax.ShapeDtypeStruct(film.shape, jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
    )(tile_alive.astype(jnp.int32), cam, seed2, pxpy, state, meta, film,
      *rand_args, tri_rows, em_rows, env_row)


def build_cam_params(scene, width: int, height: int, fov_axis: str = "x"):
    """Pack the perspective camera for the fused step kernel: rot(9) +
    origin(3) + tan_half_x + tan_half_y (matches generate_rays)."""
    aspect = width / height
    tan_half = scene.cam_tan_half_fov
    if fov_axis == "x":
        tx, ty = tan_half, tan_half / aspect
    else:
        tx, ty = tan_half * aspect, tan_half
    rot = scene.cam_to_world[:3, :3]
    return jnp.concatenate([
        rot.reshape(9),
        scene.cam_to_world[:3, 3],
        jnp.reshape(tx, (1,)),
        jnp.reshape(ty, (1,)),
    ]).astype(jnp.float32)


@partial(jax.jit, static_argnames=(
    "n_tris", "n_em", "max_depth", "rr_depth", "types", "interpret",
))
def bounce(state, meta, rand, tri_rows, em_rows, env_row,
           n_tris: int, n_em: int, max_depth: int, rr_depth: int,
           types: tuple = (T_DIFFUSE,), interpret: bool = False,
           tile_alive=None):
    """One bounce for all lanes.

    state [16, R, 128] f32, meta [R, 128] i32, rand [8, R, 128] f32,
    tri_rows [40, T] f32, em_rows [18, E] f32, env_row [1, 128] f32.
    R must be a multiple of RT. Returns (new_state, new_meta, splat[8,R,128]).

    tile_alive (optional [R // RT] i32): whole-tile skip flags — a 0 tile
    passes its state through untouched with a zero splat at DMA cost
    (drain-tail optimization for the striped pool).
    """
    r = state.shape[1]
    assert n_tris <= MAX_TRIS
    n_cols = tri_rows.shape[1]
    if n_tris > MAX_UNROLL_TRIS:
        assert n_cols % CHUNK == 0, n_cols
    assert all(t in SUPPORTED_TYPES for t in types), types
    chunked = n_tris > MAX_UNROLL_TRIS
    rt = RT_CHUNKED if chunked else RT
    assert r % rt == 0, (r, rt)
    grid = (r // rt,)
    scratch = [pltpu.VMEM((26, rt, 128), jnp.float32)] if chunked else []
    tile_skip = tile_alive is not None
    skip_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] if tile_skip else []
    )
    skip_args = (tile_alive.astype(jnp.int32),) if tile_skip else ()
    return pl.pallas_call(
        _bounce_kernel(n_tris, n_cols, n_em, max_depth, rr_depth,
                       tuple(types), tile_skip=tile_skip),
        grid=grid,
        scratch_shapes=scratch,
        in_specs=skip_specs + [
            pl.BlockSpec((16, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAND_ROWS, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rt, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct(meta.shape, jnp.int32),
            jax.ShapeDtypeStruct((8, r, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*skip_args, state, meta, rand, tri_rows, em_rows, env_row)


# Backward-compatible alias (diffuse-only call sites).
def diffuse_bounce(state, meta, rand, tri_rows, em_rows, env_row,
                   n_tris: int, n_em: int, max_depth: int, rr_depth: int,
                   interpret: bool = False):
    return bounce(state, meta, rand, tri_rows, em_rows, env_row,
                  n_tris=n_tris, n_em=n_em, max_depth=max_depth,
                  rr_depth=rr_depth, types=(T_DIFFUSE,), interpret=interpret)


def build_tables(scene):
    """Host/trace-time packing of the scene into kernel tables.

    Returns (tri_rows [40, T_pad], em_rows [18, E], env_row [1, 128]).
    T is padded to a CHUNK multiple for scenes past the unroll limit;
    padding columns are all-zero (degenerate -> det == 0 -> never hit).
    """
    t = scene.tri_v0.shape[0]
    tri = jnp.zeros((TRI_ROWS, t))
    # Woop precompute: A = [e1 e2 n] (columns), B = A^-1, c = -B v0.
    # Runs under jit (scene may be traced), so stays in jnp; XLA constant-
    # folds it when the scene is concrete.
    v0 = scene.tri_v0.astype(jnp.float32)
    e1 = scene.tri_e1.astype(jnp.float32)
    e2 = scene.tri_e2.astype(jnp.float32)
    n = jnp.cross(e1, e2)
    a = jnp.stack([e1, e2, n], axis=-1)  # [T, 3, 3]
    det = jnp.linalg.det(a)
    ok = jnp.abs(det) > 1e-24
    a_safe = jnp.where(ok[:, None, None], a, jnp.eye(3)[None])
    b = jnp.where(ok[:, None, None], jnp.linalg.inv(a_safe), 0.0)
    c = jnp.where(ok[:, None], -jnp.einsum("tij,tj->ti", b, v0), 0.0)
    tri = tri.at[_TW + 0:_TW + 9].set(b.reshape(t, 9).T)
    tri = tri.at[_TW + 9:_TW + 12].set(c.T)
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
    bid = scene.tri_bsdf
    tri = tri.at[_TAL:_TAL + 3].set(scene.bsdf_albedo[bid].T)
    tri = tri.at[_TTY].set(scene.bsdf_type[bid].astype(jnp.float32))
    tri = tri.at[_TALP].set(scene.bsdf_alpha[bid])
    tri = tri.at[_TETA].set(scene.bsdf_eta[bid])
    tri = tri.at[_TK:_TK + 3].set(scene.bsdf_k[bid].T)
    tri = tri.at[_TSP:_TSP + 3].set(scene.bsdf_specular[bid].T)
    if t > MAX_UNROLL_TRIS and t % CHUNK != 0:
        tri = jnp.pad(tri, ((0, 0), (0, CHUNK - t % CHUNK)))

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
