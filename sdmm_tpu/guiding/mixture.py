"""Spatio-directional Gaussian mixtures, batched ``[L leaves, K components]``.

TPU-native re-implementation of the missing ``sdmm`` submodule's mixture core
(API surface: SURVEY.md §2.3; math spec:
jmm/multivariate_tangent_normal.h MultivariateTangentNormal — pdf :367,
sample :321, precomputeConditioning :387, conditional :417;
jmm/mixture_model.h posteriorAndLog :146). The 5-D model: 3 Euclidean
(canonical position) + 2 tangent dims at a unit mean direction on S².

Instead of enoki SoA packets over components, everything is a dense
``[L, K, ...]`` array; dead components carry weight 0 (the reference kills
components the same way, stepwise_tangent.h:750-753). All ops are pure JAX
and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import warp
from . import tangent as tg

INV_SQRT_TWO_PI = 0.3989422804014327
Z_TRUST = 3.0  # whitened-sigma trust radius for conditional extrapolation
# (see create_conditional; mirrored in ops/guided_pallas.py)


class SDMM(NamedTuple):
    """Primary mixture parameters (the trainable state)."""

    weight: jnp.ndarray  # [L, K], normalized per leaf over alive components
    mean: jnp.ndarray  # [L, K, 6] embedded: canonical pos (3) + unit dir (3)
    cov: jnp.ndarray  # [L, K, 5, 5] joint tangent covariance


class Prepared(NamedTuple):
    """Derived quantities recomputed after every EM update
    (reference: sdmm::prepare, volpath_sdmm.cpp:237,307)."""

    rot: jnp.ndarray  # [L, K, 3, 3] tangent frame at dir mean
    chol: jnp.ndarray  # [L, K, 5, 5] lower Cholesky of cov
    inv_chol: jnp.ndarray  # [L, K, 5, 5]
    inv_det_chol: jnp.ndarray  # [L, K] = 1/prod(diag chol) = det(cov)^-1/2
    mu_a: jnp.ndarray  # [L, K, 3] spatial mean
    premult: jnp.ndarray  # [L, K, 2, 3] Σ_BA Σ_AA⁻¹
    cond_chol: jnp.ndarray  # [L, K, 2, 2] Cholesky of conditional cov
    cond_inv_chol: jnp.ndarray  # [L, K, 2, 2]
    cond_inv_det: jnp.ndarray  # [L, K]
    marg_inv_chol: jnp.ndarray  # [L, K, 3, 3] inv Cholesky of Σ_AA
    marg_inv_det: jnp.ndarray  # [L, K]
    valid: jnp.ndarray  # [L, K] alive & numerically sound


def _tri_inv(chol: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-triangular inverse."""
    n = chol.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n), chol.shape)
    fn = lambda l, i: jax.scipy.linalg.solve_triangular(l, i, lower=True)
    for _ in range(chol.ndim - 2):
        fn = jax.vmap(fn)
    return fn(chol, eye)


def _chol_safe(cov: jnp.ndarray, alive: jnp.ndarray):
    """Cholesky with dead/non-PD masking; returns (chol, ok)."""
    eye = jnp.eye(cov.shape[-1])
    safe_cov = jnp.where(alive[..., None, None], cov, eye)
    chol = jnp.linalg.cholesky(safe_cov)
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(chol), axis=(-2, -1)) & jnp.all(diag > 0.0, axis=-1)
    chol = jnp.where(ok[..., None, None], chol, eye)
    return chol, ok & alive


@jax.jit
def prepare(m: SDMM) -> Prepared:
    alive = m.weight > 0.0
    rot = tg.make_rotation(m.mean[..., 3:6])
    chol, ok = _chol_safe(m.cov, alive)
    inv_chol = _tri_inv(chol)
    inv_det = 1.0 / jnp.prod(jnp.diagonal(chol, axis1=-2, axis2=-1), axis=-1)

    cov_aa = m.cov[..., :3, :3]
    cov_ab = m.cov[..., :3, 3:]
    cov_ba = m.cov[..., 3:, :3]
    cov_bb = m.cov[..., 3:, 3:]
    marg_chol, marg_ok = _chol_safe(cov_aa, alive)
    marg_inv_chol = _tri_inv(marg_chol)
    marg_inv_det = 1.0 / jnp.prod(
        jnp.diagonal(marg_chol, axis1=-2, axis2=-1), axis=-1
    )
    # Σ_AA⁻¹ = inv_cholᵀ · inv_chol
    cov_aa_inv = jnp.einsum("...ji,...jk->...ik", marg_inv_chol, marg_inv_chol)
    premult = jnp.einsum("...ij,...jk->...ik", cov_ba, cov_aa_inv)
    cond_cov = cov_bb - jnp.einsum("...ij,...jk->...ik", premult, cov_ab)
    cond_chol, cond_ok = _chol_safe(cond_cov, alive)
    cond_inv_chol = _tri_inv(cond_chol)
    cond_inv_det = 1.0 / jnp.prod(
        jnp.diagonal(cond_chol, axis1=-2, axis2=-1), axis=-1
    )
    return Prepared(
        rot=rot, chol=chol, inv_chol=inv_chol, inv_det_chol=inv_det,
        mu_a=m.mean[..., :3], premult=premult,
        cond_chol=cond_chol, cond_inv_chol=cond_inv_chol,
        cond_inv_det=cond_inv_det,
        marg_inv_chol=marg_inv_chol, marg_inv_det=marg_inv_det,
        valid=ok & marg_ok & cond_ok,
    )


# ---------------------------------------------------------------------------
# Joint 5-D pdf / posterior (spec: pdfAndLog, multivariate_tangent_normal.h:350)
# ---------------------------------------------------------------------------


def joint_tangent(mean, rot, pos, d):
    """Per-component joint tangent coords of a sample.

    mean/rot: [..., K, 6] / [..., K, 3, 3]; pos/d: [..., 3].
    Returns (t [..., K, 5] with ABSOLUTE spatial coords, log_jac [..., K],
    valid [..., K]) — matching the reference's convention of re-adding the
    spatial mean to the tangent vector (pdfAndLog :362-364).
    """
    t_dir, aos, valid = tg.log_map(rot, d[..., None, :])
    t = jnp.concatenate(
        [jnp.broadcast_to(pos[..., None, :], mean[..., :3].shape), t_dir], axis=-1
    )
    return t, aos, valid


def component_pdf(mean, inv_chol, inv_det, rot, pos, d):
    """Per-component joint pdf and tangent coords.

    Returns (pdf [..., K], t_abs [..., K, 5]).
    """
    t_abs, aos, valid = joint_tangent(mean, rot, pos, d)
    centered = t_abs.at[..., :3].add(-mean[..., :3])
    z = jnp.einsum("...ij,...j->...i", inv_chol, centered)
    norm = INV_SQRT_TWO_PI ** 5
    pdf = norm * jnp.exp(-0.5 * jnp.sum(z * z, axis=-1)) * inv_det * aos
    pdf = jnp.where(valid, pdf, 0.0)
    return pdf, t_abs


def posterior_and_log(weight, mean, inv_chol, inv_det, rot, pos, d,
                      heuristic_pdf=None, heuristic_weight=None):
    """Responsibilities + tangent coords in one pass
    (spec: mixture_model.h:146-192 posteriorAndLog).

    weight: [..., K]; pos, d: [..., 3]. Returns (pdf_k, posterior_k, t_abs,
    heuristic_posterior).
    """
    pdf, t_abs = component_pdf(mean, inv_chol, inv_det, rot, pos, d)
    post = weight * pdf
    total = jnp.sum(post, axis=-1)
    if heuristic_pdf is not None:
        hw = heuristic_weight
        total = (1.0 - hw) * total + hw * heuristic_pdf
        inv_total = jnp.where(total > 0.0, 1.0 / total, 0.0)
        posterior = post * ((1.0 - hw) * inv_total)[..., None]
        heur_post = hw * heuristic_pdf * inv_total
    else:
        inv_total = jnp.where(total > 0.0, 1.0 / total, 0.0)
        posterior = post * inv_total[..., None]
        heur_post = jnp.zeros_like(total)
    finite = jnp.isfinite(inv_total)
    posterior = jnp.where(finite[..., None], posterior, 0.0)
    return pdf, posterior, t_abs, jnp.where(finite, heur_post, 0.0)


# ---------------------------------------------------------------------------
# Conditioning (spec: precomputeConditioning/conditional,
# multivariate_tangent_normal.h:387-439; sdmm::create_conditional)
# ---------------------------------------------------------------------------


class Conditional(NamedTuple):
    """Per-sample directional mixture conditioned on position.

    All arrays have leading sample dims + trailing K.
    """

    weight: jnp.ndarray  # [..., K] normalized conditional weights
    mu_dir: jnp.ndarray  # [..., K, 3] conditional mean directions
    rot: jnp.ndarray  # [..., K, 3, 3] tangent frames at mu_dir
    chol: jnp.ndarray  # [..., K, 2, 2]
    inv_chol: jnp.ndarray  # [..., K, 2, 2]
    inv_det: jnp.ndarray  # [..., K]
    valid: jnp.ndarray  # [...] whole-conditional validity


def marginal_pdf(mu_a, marg_inv_chol, marg_inv_det, pos):
    """Spatial marginal N(pos; μ_A, Σ_AA) per component; pos [..., 3]."""
    centered = pos[..., None, :] - mu_a
    z = jnp.einsum("...ij,...j->...i", marg_inv_chol, centered)
    norm = INV_SQRT_TWO_PI ** 3
    return norm * jnp.exp(-0.5 * jnp.sum(z * z, axis=-1)) * marg_inv_det


def create_conditional(prep_g, weight_g, pos) -> Conditional:
    """Condition gathered mixture components on position ``pos``.

    prep_g: Prepared with leading sample dims (already gathered per sample);
    weight_g: [..., K]; pos: [..., 3].

    Weights are computed in LOG space with max-subtraction: the linear
    marginal exp(-z²/2) underflows f32 past ~13 whitened σ, which used to
    invalidate the conditional at ~87% of protocol-scale lookups (tight
    EM spatial clusters + query positions between them) and silently fall
    back to BSDF sampling. Only the RELATIVE component masses matter for
    the conditional, so log-sum-exp keeps it valid anywhere the means are
    finite (reference computes responsibilities in log space likewise:
    jmm/mixture_model.h:146-192 posteriorAndLog).
    """
    centered = pos[..., None, :] - prep_g.mu_a
    z = jnp.einsum("...ij,...j->...i", prep_g.marg_inv_chol, centered)
    q = jnp.sum(z * z, axis=-1)
    logm = jnp.log(jnp.maximum(prep_g.marg_inv_det, 1e-38)) - 0.5 * q
    logw = jnp.where(
        prep_g.valid & (weight_g > 0.0),
        jnp.log(jnp.maximum(weight_g, 1e-38)) + logm,
        -jnp.inf,
    )
    m = jnp.max(logw, axis=-1)
    valid = jnp.isfinite(m)
    w = jnp.where(
        valid[..., None],
        jnp.exp(logw - jnp.where(valid, m, 0.0)[..., None]), 0.0,
    )
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-38)

    # Extrapolation trust region: the conditional mean shift
    # mu_{B|A} = Sigma_BA Sigma_AA^-1 (x - mu_A) is a LINEAR
    # extrapolation; tens of whitened sigma from a component (tight
    # post-decay EM spatial clusters) it produces confidently-wrong
    # directional lobes. The reference never evaluates these - its
    # linear-f32 marginal underflows there and the whole conditional
    # falls back to BSDF sampling (jmm/mixture_model.h:292-297 invSum
    # isfinite check). Instead of disabling guiding, the conditioning
    # offset is CLAMPED to the Z_TRUST*sigma surface per component
    # (sampling and pdf use the same clamped conditional, so the
    # estimator stays unbiased); the component WEIGHTS keep the true
    # distances, so the nearest component still dominates.
    zn = jnp.sqrt(jnp.maximum(q, 1e-30))
    cl = jnp.minimum(1.0, Z_TRUST / zn)
    t_mean = cl[..., None] * jnp.einsum(
        "...ij,...j->...i", prep_g.premult, centered
    )
    mu_dir, _, exp_ok = tg.exp_map(prep_g.rot, t_mean)
    # Out-of-range conditional means (|t| ≥ π) zero that component.
    w = jnp.where(exp_ok, w, 0.0)
    rot = tg.make_rotation(mu_dir)
    return Conditional(
        weight=w, mu_dir=mu_dir, rot=rot,
        chol=prep_g.cond_chol, inv_chol=prep_g.cond_inv_chol,
        inv_det=prep_g.cond_inv_det, valid=valid,
    )


@jax.jit
def pack_conditioning(prep: Prepared, weight: jnp.ndarray,
                      initialized: jnp.ndarray) -> jnp.ndarray:
    """Row-pack everything ``create_conditional`` needs into one [L, C]
    array. XLA TPU gathers cost ~tens of ns per ROW regardless of row
    width, so the per-ray leaf lookup must be ONE wide gather, not ten
    narrow ones (measured on a 131k-ray wave: 41 ms as a pytree gather,
    ~2 ms packed). C = K*(1+3+9+1+6+9+4+4+1+1) + 1 = 625 for K=16."""
    L, K = weight.shape
    parts = [
        weight,
        prep.mu_a.reshape(L, -1),
        prep.marg_inv_chol.reshape(L, -1),
        prep.marg_inv_det,
        prep.premult.reshape(L, -1),
        prep.rot.reshape(L, -1),
        prep.cond_chol.reshape(L, -1),
        prep.cond_inv_chol.reshape(L, -1),
        prep.cond_inv_det,
        prep.valid.astype(jnp.float32),
        initialized.astype(jnp.float32)[:, None],
    ]
    return jnp.concatenate(parts, axis=-1)


def unpack_conditioning(rows: jnp.ndarray, k: int):
    """Inverse of pack_conditioning for gathered rows [..., C].

    Returns (weight [..., K], Prepared with the conditioning fields set,
    initialized [...] bool). The joint-pdf fields (chol/inv_chol/
    inv_det_chol) are not packed — create_conditional never reads them.
    """
    off = 0
    batch = rows.shape[:-1]

    def take(n, shape):
        nonlocal off
        out = rows[..., off:off + n].reshape(batch + shape)
        off += n
        return out

    weight = take(k, (k,))
    mu_a = take(3 * k, (k, 3))
    marg_inv_chol = take(9 * k, (k, 3, 3))
    marg_inv_det = take(k, (k,))
    premult = take(6 * k, (k, 2, 3))
    rot = take(9 * k, (k, 3, 3))
    cond_chol = take(4 * k, (k, 2, 2))
    cond_inv_chol = take(4 * k, (k, 2, 2))
    cond_inv_det = take(k, (k,))
    valid = take(k, (k,)) > 0.5
    initialized = take(1, (1,))[..., 0] > 0.5
    prep = Prepared(
        rot=rot, chol=None, inv_chol=None, inv_det_chol=None,
        mu_a=mu_a, premult=premult, cond_chol=cond_chol,
        cond_inv_chol=cond_inv_chol, cond_inv_det=cond_inv_det,
        marg_inv_chol=marg_inv_chol, marg_inv_det=marg_inv_det,
        valid=valid,
    )
    return weight, prep, initialized


def conditional_pdf(c: Conditional, d: jnp.ndarray) -> jnp.ndarray:
    """Mixture pdf over directions (solid-angle measure); d [..., 3]."""
    t, aos, ok = tg.log_map(c.rot, d[..., None, :])
    z = jnp.einsum("...ij,...j->...i", c.inv_chol, t)
    norm = INV_SQRT_TWO_PI ** 2
    pdf_k = norm * jnp.exp(-0.5 * jnp.sum(z * z, axis=-1)) * c.inv_det * aos
    pdf_k = jnp.where(ok, pdf_k, 0.0)
    return jnp.sum(c.weight * pdf_k, axis=-1)


def conditional_sample(c: Conditional, key) -> jnp.ndarray:
    """Draw one direction per sample from the conditional mixture."""
    batch = c.weight.shape[:-1]
    k1, k2 = jax.random.split(key)
    u_sel = jax.random.uniform(k1, batch)
    u = jax.random.uniform(k2, batch + (2,))
    return conditional_sample_from_uniforms(c, u_sel, u)


def conditional_sample_from_uniforms(c: Conditional, u_sel, u):
    """conditional_sample with explicit uniforms (u_sel [...], u [..., 2]) —
    lets the Pallas guided kernel (ops/guided_pallas.py) be parity-tested
    against this path with identical randoms."""
    cdf = jnp.cumsum(c.weight, axis=-1)
    sel = jnp.sum((u_sel[..., None] > cdf).astype(jnp.int32), axis=-1)
    sel = jnp.clip(sel, 0, c.weight.shape[-1] - 1)

    z = warp.square_to_std_normal(u)
    # One-hot contraction instead of take_along_axis: K is small (16) and
    # per-row gathers are ~serial on TPU, while the masked sum vectorizes.
    onehot = jax.nn.one_hot(sel, c.weight.shape[-1], dtype=c.chol.dtype)
    chol_s = jnp.einsum("...k,...kij->...ij", onehot, c.chol)
    rot_s = jnp.einsum("...k,...kij->...ij", onehot, c.rot)
    t = jnp.einsum("...ij,...j->...i", chol_s, z)
    d, _, ok = tg.exp_map(rot_s, t)
    return d, ok


# ---------------------------------------------------------------------------
# Product of directional mixtures (spec: multiply,
# multivariate_tangent_normal.h:571-617; sdmm::product)
# ---------------------------------------------------------------------------


def prune_conditional(c: Conditional, k: int) -> Conditional:
    """Keep the top-k components by weight, renormalized.

    Reference: sdmm::create_conditional_pruned(conditioner, cond, dmm,
    top_k) — the learned-BSDF conditional is pruned to its top_k = 2
    components before the mixture product so products are K_guide x k
    instead of K_guide x K_bsdf (roughconductor.cpp:192,
    roughplastic.cpp:223).
    """
    w, idx = jax.lax.top_k(c.weight, k)  # [..., k]
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)

    # take_along_axis with broadcasting over trailing dims.
    def gather(a):
        extra = a.ndim - idx.ndim
        ix = idx.reshape(idx.shape + (1,) * extra)
        ix = jnp.broadcast_to(ix, idx.shape + a.shape[idx.ndim:])
        return jnp.take_along_axis(a, ix, axis=idx.ndim - 1)

    return Conditional(
        weight=w / wsum,
        mu_dir=gather(c.mu_dir),
        rot=gather(c.rot),
        chol=gather(c.chol),
        inv_chol=gather(c.inv_chol),
        inv_det=gather(c.inv_det),
        valid=c.valid,
    )


def product(a: Conditional, b: Conditional):
    """Pairwise mixture product a×b → Conditional with K_a·K_b components.

    Used for BSDF-product sampling (reference: sdmm_proc.cpp:375-381).
    Each pair (i, j): Gaussians multiplied in a's tangent frame with b's
    covariance transported via exp/log Jacobian chains.
    """
    ka = a.weight.shape[-1]
    kb = b.weight.shape[-1]
    batch = a.weight.shape[:-1]

    # Expand: a components on axis -2, b on axis -1 (flattened at the end).
    a_rot = a.rot[..., :, None, :, :]
    b_rot = b.rot[..., None, :, :, :]
    a_cov = jnp.einsum("...ij,...jk->...ik", a.chol, jnp.swapaxes(a.chol, -1, -2))
    b_cov = jnp.einsum("...ij,...jk->...ik", b.chol, jnp.swapaxes(b.chol, -1, -2))
    a_cov = a_cov[..., :, None, :, :]
    b_cov = b_cov[..., None, :, :, :]
    b_mu = b.mu_dir[..., None, :, :]

    # b's mean in a's tangent space.
    t_b, aos, log_ok = tg.log_map(a_rot, b_mu)
    # Transport b's cov into a's tangent frame at a's mean:
    # J = J_log_a(world) ∘ R_b ∘ J_exp_b(0)  (b's tangent mean is 0 at its own frame).
    zero2 = jnp.zeros_like(t_b)
    exp_j = tg.exp_jacobian(zero2)  # [..., 3, 2] (identity-ish at 0)
    log_j = tg.log_jacobian(a_rot, b_mu)  # [..., 2, 3] includes R_a^T
    j = jnp.einsum("...ij,...jk,...kl->...il", log_j, b_rot, exp_j)  # [..., 2, 2]
    b_cov_t = jnp.einsum("...ij,...jk,...lk->...il", j, b_cov, j)

    cov_sum = a_cov + b_cov_t
    # 2x2 inverse.
    det = (
        cov_sum[..., 0, 0] * cov_sum[..., 1, 1]
        - cov_sum[..., 0, 1] * cov_sum[..., 1, 0]
    )
    inv_det_sum = jnp.where(jnp.abs(det) > 1e-38, 1.0 / det, 0.0)
    adj = jnp.stack(
        [
            jnp.stack([cov_sum[..., 1, 1], -cov_sum[..., 0, 1]], axis=-1),
            jnp.stack([-cov_sum[..., 1, 0], cov_sum[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    inv_sum = adj * inv_det_sum[..., None, None]

    # New mean in a's tangent frame: (B (A+B)⁻¹)·0 + (A (A+B)⁻¹)·t_b.
    mean_new_t = jnp.einsum(
        "...ij,...jk,...k->...i", a_cov, inv_sum, t_b
    )
    cov_new_t = jnp.einsum("...ij,...jk,...kl->...il", a_cov, inv_sum, b_cov_t)
    # Symmetrize.
    cov_new_t = 0.5 * (cov_new_t + jnp.swapaxes(cov_new_t, -1, -2))

    mu_new, _, exp_ok = tg.exp_map(a_rot, mean_new_t)
    rot_new = tg.make_rotation(mu_new)
    # Transport product cov to the new frame.
    exp_j2 = tg.exp_jacobian(mean_new_t)
    log_j2 = tg.log_jacobian(rot_new, mu_new)
    j2 = jnp.einsum("...ij,...jk,...kl->...il", log_j2, a_rot, exp_j2)
    cov_new = jnp.einsum("...ij,...jk,...lk->...il", j2, cov_new_t, j2)
    cov_new = 0.5 * (cov_new + jnp.swapaxes(cov_new, -1, -2))

    # Pair weight: N(t_b; 0, A+B) · Jacobian factor.
    z_det = jnp.sqrt(jnp.maximum(det, 1e-38))
    maha = jnp.einsum("...i,...ij,...j->...", t_b, inv_sum, t_b)
    s_ij = (INV_SQRT_TWO_PI ** 2) * jnp.exp(-0.5 * maha) / z_det * aos
    w = a.weight[..., :, None] * b.weight[..., None, :] * s_ij
    w = jnp.where(log_ok & exp_ok, w, 0.0)

    flat = batch + (ka * kb,)
    w = w.reshape(flat)
    total = jnp.sum(w, axis=-1)
    valid = (total > 0.0) & jnp.isfinite(total) & a.valid & b.valid
    w = jnp.where(valid[..., None], w / jnp.maximum(total[..., None], 1e-38), 0.0)

    cov_new = cov_new.reshape(flat + (2, 2))
    alive = w > 0.0
    chol, ok = _chol_safe(cov_new, alive)
    w = jnp.where(ok | ~alive, w, 0.0)
    inv_chol = _tri_inv(chol)
    inv_det = 1.0 / jnp.prod(jnp.diagonal(chol, axis1=-2, axis2=-1), axis=-1)
    return Conditional(
        weight=w,
        mu_dir=mu_new.reshape(flat + (3,)),
        rot=rot_new.reshape(flat + (3, 3)),
        chol=chol, inv_chol=inv_chol, inv_det=inv_det,
        valid=valid,
    )
