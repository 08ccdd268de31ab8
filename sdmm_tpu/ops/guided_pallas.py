"""Pallas TPU kernel for SDMM guided sampling: conditioning + mixture
sample + pdf in one pass over attribute-major packed leaf rows.

The XLA implementation of the guided hot path (guiding/mixture.py
``create_conditional`` → ``conditional_sample`` → ``conditional_pdf``,
mirroring the reference's ``sampleSurface``/``pdfSurface``,
mitsuba/src/integrators/sdmm/sdmm_proc.cpp:275-590) materializes every
``[N, K, ...]`` intermediate in HBM — measured ~7 ms of a 14.6 ms guided
pool step at 131k lanes. This kernel keeps the whole per-component chain
(spatial marginal, conditional tangent mean, exp-map, CDF component
selection, Box-Muller sampling, and the K-component pdf at BOTH candidate
directions) in VMEM registers: the only HBM traffic is the packed
conditioning rows in and four small per-lane outputs out.

Layout: lanes ride the trailing 128-wide dim ([C, R, 128] attribute-major,
the same convention as ops/bounce_pallas.py); the K = 16 component loop is
Python-unrolled with static row offsets, so there are no gathers anywhere.

Semantics replicate guiding/mixture.py exactly (same clamps, the same
normalize-then-zero-by-exp_ok weight convention) so the parity tests can
compare against the XLA path at fp32 tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PI = 3.141592653589793
INV_TWO_PI = 0.15915494309189535  # (1/sqrt(2pi))^2
_SINC_EPS = 1e-4

K = 16  # components per leaf (reference: sdmm_proc.h:55)
ROWS_PER_K = 22
# Per-component row layout (offsets within a component's 22-row block):
#  0      weight * prep.valid
#  1-3    mu_a (spatial mean)
#  4-9    marg_inv_chol lower (m00, m10, m11, m20, m21, m22)
#  10-15  premult [2, 3] row-major
#  16-18  mu_dir (unit mean direction; the tangent frame is rebuilt
#         in-kernel via the same Duff construction as make_rotation —
#         3 rows instead of the 9-row rotation matrix, 21% less glue
#         traffic per lane)
#  19-21  cond_chol lower (c00, c10, c11)
N_ROWS = K * ROWS_PER_K + 1  # + initialized flag row = 353

RT = 8  # sublane rows per lane tile -> RT*128 = 1024 lanes/tile


@jax.jit
def pack_guided_rows(prep, weight: jnp.ndarray,
                     initialized: jnp.ndarray) -> jnp.ndarray:
    """[L]-leaf conditioning table → [N_ROWS, L] attribute-major rows.

    jitted: the ~353 tiny stacked slices would otherwise dispatch eagerly
    (~2 ms/dispatch through the TPU relay ⇒ ~1 s per call — measured).

    The row gather per lane then happens in XLA ([L, C] row gather is fast
    on TPU; the transpose back to [C, N] feeds this kernel).
    """
    L = weight.shape[0]
    per_k = []
    w = weight * prep.valid.astype(weight.dtype)
    for k in range(K):
        rows = [
            w[:, k],
            prep.mu_a[:, k, 0], prep.mu_a[:, k, 1], prep.mu_a[:, k, 2],
            prep.marg_inv_chol[:, k, 0, 0],
            prep.marg_inv_chol[:, k, 1, 0],
            prep.marg_inv_chol[:, k, 1, 1],
            prep.marg_inv_chol[:, k, 2, 0],
            prep.marg_inv_chol[:, k, 2, 1],
            prep.marg_inv_chol[:, k, 2, 2],
            prep.premult[:, k, 0, 0], prep.premult[:, k, 0, 1],
            prep.premult[:, k, 0, 2],
            prep.premult[:, k, 1, 0], prep.premult[:, k, 1, 1],
            prep.premult[:, k, 1, 2],
        ]
        # Unit mean direction; rot = make_rotation(mu_dir) is rebuilt
        # in-kernel (rot columns are the Duff frame of mu_dir).
        rows += [prep.rot[:, k, 0, 2], prep.rot[:, k, 1, 2],
                 prep.rot[:, k, 2, 2]]
        rows += [
            prep.cond_chol[:, k, 0, 0],
            prep.cond_chol[:, k, 1, 0],
            prep.cond_chol[:, k, 1, 1],
        ]
        per_k.append(jnp.stack(rows, axis=0))
    table = jnp.concatenate(
        per_k + [initialized.astype(jnp.float32)[None, :]], axis=0
    )
    return table.astype(jnp.float32)


def _sinc(x):
    small = jnp.abs(x) < _SINC_EPS
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(safe) / safe)


def _acos(x):
    """Mosaic has no acos/atan2; Abramowitz & Stegun 4.4.45 cubic with the
    sqrt(1-x) prefactor — uniform ~1e-4 RELATIVE angle accuracy (the
    absolute error carries the same sqrt prefactor as the angle)."""
    xa = jnp.abs(x)
    poly = 1.5707288 + xa * (
        -0.2121144 + xa * (0.0742610 - 0.0187293 * xa)
    )
    ang = jnp.sqrt(jnp.maximum(1.0 - xa, 0.0)) * poly
    return jnp.where(x >= 0.0, ang, PI - ang)


def _coord_system(mx, my, mz):
    """Duff et al. branchless frame; returns (s, t) rows (each 3 lanes)."""
    sign = jnp.where(mz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + mz)
    b = mx * my * a
    s = (1.0 + sign * mx * mx * a, sign * b, -sign * mx)
    t = (b, sign + my * my * a, -my)
    return s, t


def _log_map_pdf(sx, sy, sz, tx, ty, tz, mx, my, mz,
                 dx, dy, dz, i00, i10, i11, inv_det):
    """pdf_k(dir) under the conditional component with frame rows
    (s, t, mu) and 2x2 inverse Cholesky i — matches mixture.conditional_pdf."""
    rel0 = sx * dx + sy * dy + sz * dz
    rel1 = tx * dx + ty * dy + tz * dz
    rel2 = mx * dx + my * dy + mz * dz
    cosa = jnp.clip(rel2, -1.0, 1.0)
    d2 = dx * dx + dy * dy + dz * dz
    ok = (cosa > -1.0 + 1e-7) & (d2 > 0.0)
    sina = jnp.sqrt(jnp.maximum(1.0 - cosa * cosa, 0.0))
    angle = _acos(cosa)
    aos = jnp.where(sina < 1e-3, 1.0, angle / jnp.maximum(sina, 1e-12))
    t0 = rel0 * aos
    t1 = rel1 * aos
    z0 = i00 * t0
    z1 = i10 * t0 + i11 * t1
    pdf = INV_TWO_PI * jnp.exp(-0.5 * (z0 * z0 + z1 * z1)) * inv_det * aos
    return jnp.where(ok, pdf, 0.0)


def guided_tile(row, px, py, pz, bx, by, bz, u_sel, u_r, u_th):
    """Per-tile guided mixture math on register values.

    ``row``: callable j -> [RT, 128] packed-attribute value (a ref read in
    the standalone kernel; also usable from the fused guided step kernel).
    Inputs px..pz canonical position, bx..bz BSDF-sampled world direction,
    u_* uniforms. Returns (gx, gy, gz, g_ok, pdf_g, pdf_b, cond_valid,
    initialized) — the sampled direction, its exp-map validity, the K-
    component conditional pdf at the sampled and at the BSDF direction,
    conditional validity, and the leaf's initialized flag.
    """
    # ---- pass 1: spatial marginal weights + conditional tangent means ----
    # LOG space with max-subtraction: the linear exp(-q/2) underflows f32
    # past ~13 whitened σ, which used to invalidate the conditional at
    # ~87% of protocol-scale lookups (see mixture.create_conditional).
    _NEG = -1.0e30
    lw = []
    tm0s = []
    tm1s = []
    lmax = jnp.full_like(px, _NEG)
    for k in range(K):
        b = k * ROWS_PER_K
        d0 = px - row(b + 1)
        d1 = py - row(b + 2)
        d2 = pz - row(b + 3)
        m00 = row(b + 4)
        m10 = row(b + 5)
        m11 = row(b + 6)
        m20 = row(b + 7)
        m21 = row(b + 8)
        m22 = row(b + 9)
        z0 = m00 * d0
        z1 = m10 * d0 + m11 * d1
        z2 = m20 * d0 + m21 * d1 + m22 * d2
        q = z0 * z0 + z1 * z1 + z2 * z2
        wd = row(b + 0) * m00 * m11 * m22
        lw_k = jnp.where(
            wd > 0.0, jnp.log(jnp.maximum(wd, 1e-38)) - 0.5 * q, _NEG
        )
        # Conditional-extrapolation trust region (mixture.Z_TRUST): clamp
        # the conditioning offset to the 3-whitened-sigma surface; must
        # stay bit-consistent with mixture.create_conditional.
        cl = jnp.minimum(1.0, 3.0 / jnp.sqrt(jnp.maximum(q, 1e-30)))
        tm0 = cl * (row(b + 10) * d0 + row(b + 11) * d1 + row(b + 12) * d2)
        tm1 = cl * (row(b + 13) * d0 + row(b + 14) * d1 + row(b + 15) * d2)
        lw.append(lw_k)
        tm0s.append(tm0)
        tm1s.append(tm1)
        lmax = jnp.maximum(lmax, lw_k)

    # Upper guard: if weight*det overflowed f32 to +inf (near-degenerate
    # covariance), lmax=+inf would make lw_k - lref = inf - inf = NaN and
    # poison the conditional weights; invalidate instead, mirroring
    # mixture.create_conditional's jnp.isfinite(m) (ADVICE r4).
    cond_valid = (lmax > 0.5 * _NEG) & (lmax < -_NEG)
    lref = jnp.where(cond_valid, lmax, 0.0)
    wt = [jnp.exp(jnp.maximum(lw_k - lref, -80.0)) *
          jnp.where(lw_k > 0.5 * _NEG, 1.0, 0.0) for lw_k in lw]
    total = wt[0]
    for k in range(1, K):
        total = total + wt[k]
    inv_total = jnp.where(cond_valid, 1.0 / jnp.maximum(total, 1e-38), 0.0)

    # Normalize, THEN zero by exp-map range (|t_mean| >= pi) — matching
    # mixture.create_conditional's order, so weights may sum below 1.
    mu = []
    wnorm = []
    for k in range(K):
        b = k * ROWS_PER_K
        tm0, tm1 = tm0s[k], tm1s[k]
        l2 = tm0 * tm0 + tm1 * tm1
        ln = jnp.sqrt(jnp.maximum(l2, 0.0))
        exp_ok = ln < PI
        s_ = _sinc(ln)
        rel0 = tm0 * s_
        rel1 = tm1 * s_
        rel2 = jnp.cos(ln)
        mdx = row(b + 16)
        mdy = row(b + 17)
        mdz = row(b + 18)
        (csx, csy, csz), (ctx, cty, ctz) = _coord_system(mdx, mdy, mdz)
        # d = R @ rel with columns (s, t, mu_dir).
        mx = csx * rel0 + ctx * rel1 + mdx * rel2
        my = csy * rel0 + cty * rel1 + mdy * rel2
        mz = csz * rel0 + ctz * rel1 + mdz * rel2
        mu.append((mx, my, mz))
        wnorm.append(jnp.where(exp_ok, wt[k] * inv_total, 0.0))

    # ---- component selection (CDF; matches mixture.conditional_sample) ----
    cdf = jnp.zeros_like(px)
    sel = jnp.zeros_like(px)  # float count, exact for K <= 16
    for k in range(K):
        cdf = cdf + wnorm[k]
        sel = sel + jnp.where(u_sel > cdf, 1.0, 0.0)
    sel = jnp.minimum(sel, float(K - 1))

    sel_mu_x = jnp.zeros_like(px)
    sel_mu_y = jnp.zeros_like(px)
    sel_mu_z = jnp.zeros_like(px)
    sel_c00 = jnp.zeros_like(px)
    sel_c10 = jnp.zeros_like(px)
    sel_c11 = jnp.zeros_like(px)
    for k in range(K):
        b = k * ROWS_PER_K
        m = jnp.where(sel == float(k), 1.0, 0.0)
        mx, my, mz = mu[k]
        sel_mu_x = sel_mu_x + m * mx
        sel_mu_y = sel_mu_y + m * my
        sel_mu_z = sel_mu_z + m * mz
        sel_c00 = sel_c00 + m * row(b + 19)
        sel_c10 = sel_c10 + m * row(b + 20)
        sel_c11 = sel_c11 + m * row(b + 21)

    # ---- Box-Muller sample in the selected component's tangent frame ----
    r = jnp.sqrt(jnp.maximum(
        0.0, -2.0 * jnp.log(1.0 - jnp.minimum(u_r, 1.0 - 1e-7))
    ))
    th = 2.0 * PI * u_th
    z0 = r * jnp.sin(th)
    z1 = r * jnp.cos(th)
    t0 = sel_c00 * z0
    t1 = sel_c10 * z0 + sel_c11 * z1
    ln = jnp.sqrt(jnp.maximum(t0 * t0 + t1 * t1, 0.0))
    g_ok = ln < PI
    s_ = _sinc(ln)
    rel0 = t0 * s_
    rel1 = t1 * s_
    rel2 = jnp.cos(ln)
    (ssx, ssy, ssz), (stx, sty, stz) = _coord_system(
        sel_mu_x, sel_mu_y, sel_mu_z
    )
    # d = R @ rel with columns (s, t, mu).
    gx = ssx * rel0 + stx * rel1 + sel_mu_x * rel2
    gy = ssy * rel0 + sty * rel1 + sel_mu_y * rel2
    gz = ssz * rel0 + stz * rel1 + sel_mu_z * rel2

    # ---- pass 2: mixture pdf at both candidate directions ----
    pdf_g = jnp.zeros_like(px)
    pdf_b = jnp.zeros_like(px)
    for k in range(K):
        b = k * ROWS_PER_K
        mx, my, mz = mu[k]
        (sx, sy, sz), (tx, ty, tz) = _coord_system(mx, my, mz)
        c00 = row(b + 19)
        c10 = row(b + 20)
        c11 = row(b + 21)
        i00 = 1.0 / c00
        i11 = 1.0 / c11
        i10 = -c10 * i00 * i11
        inv_det = i00 * i11
        pdf_g = pdf_g + wnorm[k] * _log_map_pdf(
            sx, sy, sz, tx, ty, tz, mx, my, mz, gx, gy, gz,
            i00, i10, i11, inv_det)
        pdf_b = pdf_b + wnorm[k] * _log_map_pdf(
            sx, sy, sz, tx, ty, tz, mx, my, mz, bx, by, bz,
            i00, i10, i11, inv_det)

    init = row(N_ROWS - 1) > 0.5
    return gx, gy, gz, g_ok, pdf_g, pdf_b, cond_valid, init


def _kernel(rows_ref, pos_ref, wob_ref, u_ref, dg_ref, pdf_ref):
    gx, gy, gz, g_ok, pdf_g, pdf_b, cond_valid, init = guided_tile(
        lambda j: rows_ref[j],
        pos_ref[0], pos_ref[1], pos_ref[2],
        wob_ref[0], wob_ref[1], wob_ref[2],
        u_ref[0], u_ref[1], u_ref[2],
    )
    dg_ref[0] = gx
    dg_ref[1] = gy
    dg_ref[2] = gz
    pdf_ref[0] = jnp.where(g_ok, 1.0, 0.0)
    pdf_ref[1] = pdf_g
    pdf_ref[2] = pdf_b
    pdf_ref[3] = jnp.where(cond_valid & init, 1.0, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def guided_sample(rows_t: jnp.ndarray, pos: jnp.ndarray, wo_b: jnp.ndarray,
                  u: jnp.ndarray, interpret: bool = False):
    """Conditioning + sample + pdf for a lane wave.

    rows_t: [N_ROWS, N] gathered packed rows (attribute-major);
    pos: [3, N] canonical positions; wo_b: [3, N] BSDF-sampled world
    directions (pdf evaluated there too, for the one-sample MIS);
    u: [3, N] uniforms (component select, Box-Muller r, Box-Muller theta).

    Returns (d_guide [3, N], g_ok [N], pdf_guide [N], pdf_bsdf [N],
    guide_valid [N]) where guide_valid = conditional-valid & initialized.
    N must be a multiple of RT*128 = 1024.
    """
    n = rows_t.shape[1]
    assert n % (RT * 128) == 0, n
    r = n // 128
    grid = r // RT

    dg, misc = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((N_ROWS, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, RT, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, r, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, r, 128), jnp.float32),
        ),
        interpret=interpret,
    )(
        rows_t.reshape(N_ROWS, r, 128),
        pos.reshape(3, r, 128),
        wo_b.reshape(3, r, 128),
        u.reshape(3, r, 128),
    )
    dg = dg.reshape(3, n)
    misc = misc.reshape(4, n)
    return (dg, misc[0] > 0.5, misc[1], misc[2], misc[3] > 0.5)
