"""Batched stepwise (streaming) MAP-EM for all tree leaves at once.

TPU-native re-design of the reference's per-leaf EM fit
(spec: jmm/opt/stepwise_tangent.h StepwiseTangentEM::optimize :597 and
calculateStats :270; invoked as sdmm::em_step from
volpath_sdmm.cpp:220,304). Two key departures from the reference:

- The E-step is one pass over the *global* sample buffer: per-sample
  responsibilities against the sample's own leaf mixture (gathered), then a
  ``segment_sum`` keyed by leaf id produces all leaves' sufficient statistics
  simultaneously. This replaces both the reference's mutex-guarded per-leaf
  sample scatter (sdmm_proc.cpp:893-913; 9.3% of its runtime) and its
  per-leaf OpenMP loops (24.7% of runtime) with dense batched linear algebra.
- The M-step runs on the whole [L, K] array with masking for inactive
  leaves / dead components — no per-leaf control flow.

All constants (η schedule, Dirichlet/inverse-Wishart-style decayed priors,
dead-component handling, PD rejection, covariance transport between tangent
frames) follow the reference M-step (stepwise_tangent.h:685-980).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import mixture as mix
from . import tangent as tg


class EMConfig(NamedTuple):
    alpha: float = 0.9  # stepwise decay exponent (stepwise_tangent.h:221)
    learning_rate: float = 0.2  # η = (lr·t + 1)^-α (stepwise_tangent.h:685)
    ni_prior: float = 6e-5  # Dirichlet weight prior - 1 (ctor default)
    a_prior: float = 100.0  # (a_prior / K) = inverse-Wishart dof - 2
    b_prior_diag: float = 1e-5  # isotropic covariance prior scale
    spatial_eps: float = 1e-8  # extra spatial diagonal prior ("bDepthPrior")
    spatial_floor_frac: float = 0.2  # NON-decaying spatial covariance floor
    # as a fraction of the leaf extent (per axis), applied when m_step
    # receives leaf extents. Rationale (round-5 anatomy probe,
    # scripts/diag_anatomy.py): with nothing but the DECAYING priors, the
    # fitted spatial covariances collapse onto their sample clusters
    # (sub-1% of the leaf); the conditional then degenerates into a
    # nearest-spatial-component lookup, and rare-but-critical lobes (the
    # direct-light lobe, learned from few high-weight samples) get ~zero
    # conditional weight over most of the leaf — measured 74% of
    # first-bounce probes "blind" to the light with the lobe PRESENT in
    # the leaf mixture. The floor keeps every lobe's spatial marginal
    # alive across ~1/frac sigma of its leaf, the same role as the
    # reference's non-decaying bDepthPrior (jmm/mixture_model_init.h:228,
    # n·nᵀ·1e-6) scaled to be effective in canonical units. Post-hoc
    # sweep on a trained protocol model (blind% at 0.05 cosine):
    # 0.2 -> 55%, 0.4 -> 22%, 0.7 -> 21% — the residual ~20% is mostly
    # genuinely occluded geometry (the probe does not test visibility).
    training_cutoff: int = 32  # prior decay clamp (stepwise_tangent.h:756)
    jacobian_correction: bool = True  # transport covs between tangent frames
    batch_size: int = 1 << 16  # E-step sample chunk


class EMState(NamedTuple):
    """Running (global) sufficient statistics per leaf-component."""

    stats_w: jnp.ndarray  # [L, K]
    stats_mean: jnp.ndarray  # [L, K, 5]
    stats_cov: jnp.ndarray  # [L, K, 5, 5]
    total_weight: jnp.ndarray  # [L]
    iterations: jnp.ndarray  # [L] int32


def init_em_state(n_leaves: int, n_components: int) -> EMState:
    return EMState(
        stats_w=jnp.zeros((n_leaves, n_components)),
        stats_mean=jnp.zeros((n_leaves, n_components, 5)),
        stats_cov=jnp.zeros((n_leaves, n_components, 5, 5)),
        total_weight=jnp.zeros((n_leaves,)),
        iterations=jnp.zeros((n_leaves,), dtype=jnp.int32),
    )


@partial(jax.jit, static_argnames=("n_leaves", "batch_size"))
def e_step(
    sdmm: mix.SDMM,
    prep: mix.Prepared,
    pos: jnp.ndarray,  # [S, 3] canonical positions
    d: jnp.ndarray,  # [S, 3] world directions
    weight: jnp.ndarray,  # [S] sample weights (radiance / clamped pdf)
    leaf: jnp.ndarray,  # [S] int32 leaf id per sample
    n_leaves: int,
    batch_size: int = 1 << 16,
):
    """Sufficient statistics via chunked gather + segment-sum.

    Returns (stats_w [L,K], stats_mean [L,K,5], stats_cov [L,K,5,5],
    weight_sum [L], count [L]).
    """
    k = sdmm.weight.shape[-1]
    s = pos.shape[0]
    pad = (-s) % batch_size
    pos = jnp.pad(pos, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)))
    weight = jnp.pad(weight, (0, pad))
    leaf = jnp.pad(leaf, (0, pad))
    # Samples with weight < 0 are invalid padding; weight == 0 samples are
    # counted (the reference pushes them into the buffers too) but contribute
    # nothing to the statistics.
    valid = jnp.pad(
        jnp.ones(s, dtype=bool) & jnp.isfinite(weight[:s]) & (weight[:s] >= 0),
        (0, pad), constant_values=False,
    )
    n_chunks = (s + pad) // batch_size

    def chunk(carry, ci):
        sw, sm, sc, ws, cnt = carry
        sl = ci * batch_size
        cp = jax.lax.dynamic_slice_in_dim(pos, sl, batch_size)
        cd = jax.lax.dynamic_slice_in_dim(d, sl, batch_size)
        cw = jax.lax.dynamic_slice_in_dim(weight, sl, batch_size)
        cl = jax.lax.dynamic_slice_in_dim(leaf, sl, batch_size)
        cv = jax.lax.dynamic_slice_in_dim(valid, sl, batch_size)

        w_g = sdmm.weight[cl]
        _, post, t_abs, _ = mix.posterior_and_log(
            w_g,
            sdmm.mean[cl],
            prep.inv_chol[cl],
            prep.inv_det_chol[cl],
            prep.rot[cl],
            cp,
            cd,
        )
        # γ_k < 1e-10 are dropped as in the reference (stepwise_tangent.h:312);
        # non-finite posteriors (degenerate samples) contribute nothing.
        post = jnp.where((post < 1e-10) | ~jnp.isfinite(post), 0.0, post)
        t_abs = jnp.nan_to_num(t_abs, nan=0.0, posinf=0.0, neginf=0.0)
        wgt = jnp.where(cv, cw, 0.0)
        gw = wgt[:, None] * post  # [B, K]
        sw = sw.at[cl].add(gw)
        sm = sm.at[cl].add(gw[..., None] * t_abs)
        sc = sc.at[cl].add(
            gw[..., None, None] * t_abs[..., :, None] * t_abs[..., None, :]
        )
        ws = ws.at[cl].add(wgt)
        cnt = cnt.at[cl].add(cv.astype(jnp.int32))
        return (sw, sm, sc, ws, cnt), None

    init = (
        jnp.zeros((n_leaves, k)),
        jnp.zeros((n_leaves, k, 5)),
        jnp.zeros((n_leaves, k, 5, 5)),
        jnp.zeros((n_leaves,)),
        jnp.zeros((n_leaves,), dtype=jnp.int32),
    )
    (sw, sm, sc, ws, cnt), _ = jax.lax.scan(
        chunk, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return sw, sm, sc, ws, cnt


@partial(jax.jit, static_argnames=("cfg",))
def m_step(
    sdmm: mix.SDMM,
    prep: mix.Prepared,
    em: EMState,
    stats_w: jnp.ndarray,
    stats_mean: jnp.ndarray,
    stats_cov: jnp.ndarray,
    weight_sum: jnp.ndarray,
    active: jnp.ndarray,  # [L] bool: leaves to update this iteration
    cfg: EMConfig = EMConfig(),
    leaf_ext: jnp.ndarray | None = None,  # [L, 3] leaf extents (canonical)
):
    """One stepwise M-step; returns (new_sdmm, new_em_state)."""
    L, K = sdmm.weight.shape
    act = active & (weight_sum > 0.0)
    a1 = act[:, None]

    # Stepwise blend (stepwise_tangent.h:685-730).
    it = em.iterations.astype(jnp.float32)
    eta = jnp.power(cfg.learning_rate * it + 1.0, -cfg.alpha)
    eta = jnp.where(act, eta, 0.0)
    g_w = (1.0 - eta)[:, None] * em.stats_w + eta[:, None] * stats_w
    g_mean = (1.0 - eta)[:, None, None] * em.stats_mean + eta[:, None, None] * stats_mean
    g_cov = (
        (1.0 - eta)[:, None, None, None] * em.stats_cov
        + eta[:, None, None, None] * stats_cov
    )
    total_w = (1.0 - eta) * em.total_weight + eta * weight_sum

    inv_total = jnp.where(total_w > 0.0, 1.0 / total_w, 0.0)
    sb_w = g_w * inv_total[:, None]
    sb_mean = g_mean * inv_total[:, None, None]
    sb_cov = g_cov * inv_total[:, None, None, None]

    # Decayed MAP priors (stepwise_tangent.h:755-772).
    it_c = jnp.minimum(em.iterations, cfg.training_cutoff).astype(jnp.float32)
    inv_g = jnp.power(3.0, -it_c)[:, None]
    inv_m = jnp.power(2.0, -it_c)[:, None]
    ni = cfg.ni_prior * inv_g
    a_m2 = (cfg.a_prior / K) * inv_m
    b_prior = (a_m2[..., None, None] * cfg.b_prior_diag) * jnp.eye(5)

    alive = sdmm.weight > 0.0
    weak = sb_w <= 1e-30  # no mass this round: keep shape, bump weight only
    w_new = ni + sb_w
    w_new = jnp.where(alive, w_new, 0.0)

    inv_sb_w = jnp.where(weak, 0.0, 1.0 / jnp.maximum(sb_w, 1e-30))
    m_new = sb_mean * inv_sb_w[..., None]  # [L,K,5]
    c_new = (
        sb_cov
        - sb_mean[..., :, None] * m_new[..., None, :]
        + b_prior
    )
    inv_norm = 1.0 / (0.05 * a_m2 + sb_w)
    c_new = c_new * inv_norm[..., None, None]
    c_new = c_new.at[..., :3, :3].add(cfg.spatial_eps * jnp.eye(3))
    c_new = 0.5 * (c_new + jnp.swapaxes(c_new, -1, -2))

    # New embedded mean: exp-map directional part in the OLD tangent frame.
    mu_dir_new, exp_jac_det, exp_ok = tg.exp_map(prep.rot, m_new[..., 3:5])
    mean_new = jnp.concatenate([m_new[..., :3], mu_dir_new], axis=-1)

    # Covariance transport old frame → new frame (stepwise_tangent.h:854-926).
    if cfg.jacobian_correction:
        rot_new = tg.make_rotation(mu_dir_new)
        jexp = tg.exp_jacobian(m_new[..., 3:5])  # [L,K,3,2] old np-frame
        jlog = tg.log_jacobian(rot_new, mu_dir_new)  # [L,K,2,3] world→new tangent
        j2 = jnp.einsum("...ij,...jk,...kl->...il", jlog, prep.rot, jexp)
    else:
        j2 = jnp.broadcast_to(jnp.eye(2), c_new[..., :2, :2].shape)
    jfull = jnp.zeros_like(c_new).at[..., :3, :3].set(jnp.eye(3))
    jfull = jfull.at[..., 3:, 3:].set(j2)
    c_new = jnp.einsum("...ij,...jk,...lk->...il", jfull, c_new, jfull)
    c_new = 0.5 * (c_new + jnp.swapaxes(c_new, -1, -2))

    # Non-decaying per-leaf spatial floor (see EMConfig.spatial_floor_frac).
    if leaf_ext is not None and cfg.spatial_floor_frac > 0.0:
        floor = (cfg.spatial_floor_frac * leaf_ext) ** 2  # [L, 3]
        c_new = c_new.at[..., :3, :3].add(
            floor[:, None, :, None] * jnp.eye(3)
        )

    # PD enforcement. The reference kills any non-PD update outright
    # (stepwise_tangent.h:945-960); in exact arithmetic E[tt^T]−μμ^T is
    # PSD, so violations here come from the stepwise EMA + recentring +
    # tangent-transport drift (measured: min eig ≈ −1e-4 against max
    # ≈ 2e-2 by leaf-iteration ~6, once the decayed b_prior is gone).
    # With kill-on-sight those drift artifacts cascade until whole
    # leaves die (84% of initialized leaves at protocol scale, which
    # silently disabled guiding). Repair SMALL violations by clamping
    # eigenvalues to a relative floor; kill only genuinely broken
    # components (min eig < −25% of max, non-finite, or ≤ 0). The
    # batched 5x5 eigh costs ~230 ms/em_step on the relay — a
    # Gershgorin-shift cheap variant was tried and rejected: its bound
    # over-shifts anisotropic 5D covariances so badly that the repair
    # either blurs the mixture or trips the kill threshold (118/1199
    # leaves dead vs 1/1179 with the eigh clamp).
    evals, evecs = jnp.linalg.eigh(c_new)
    lam_max = evals[..., -1]
    lam_min = evals[..., 0]
    shape_ok = (
        jnp.all(jnp.isfinite(evals), axis=-1)
        & (lam_max > 0.0)
        & (lam_min > -0.25 * lam_max)
    )
    floor = 1e-6 * lam_max[..., None] + 1e-12
    evals_c = jnp.maximum(evals, floor)
    c_new = jnp.einsum(
        "...ij,...j,...kj->...ik", evecs, evals_c, evecs
    )
    c_new = 0.5 * (c_new + jnp.swapaxes(c_new, -1, -2))
    chol_test = jnp.linalg.cholesky(c_new)
    diag = jnp.diagonal(chol_test, axis1=-2, axis2=-1)
    pd_ok = shape_ok & jnp.all(
        jnp.isfinite(chol_test), axis=(-2, -1)
    ) & jnp.all(diag > 0.0, axis=-1)
    good = alive & ~weak & pd_ok & exp_ok & a1
    kill = alive & ~weak & ~(pd_ok & exp_ok)  # broken update kills component
    w_new = jnp.where(kill, 0.0, w_new)
    w_new = jnp.where(a1, w_new, sdmm.weight)

    mean_out = jnp.where(good[..., None], mean_new, sdmm.mean)
    cov_out = jnp.where(good[..., None, None], c_new, sdmm.cov)

    # Renormalize weights per leaf (stepwise_tangent.h:992-1010).
    norm = jnp.sum(w_new, axis=-1, keepdims=True)
    w_out = jnp.where(norm > 0.0, w_new / jnp.maximum(norm, 1e-30), w_new)
    w_out = jnp.where(a1, w_out, sdmm.weight)

    # Recentre + transport running covariance stats around the new mean
    # (stepwise_tangent.h:967-979).
    sb_cov2 = sb_cov - sb_mean[..., :, None] * m_new[..., None, :]
    cm_stat = sb_mean.at[..., 3:].set(0.0)
    cm_new = m_new.at[..., 3:].set(0.0)
    sb_cov2 = sb_cov2 + cm_stat[..., :, None] * cm_new[..., None, :]
    sb_cov2 = jnp.einsum("...ij,...jk,...lk->...il", jfull, sb_cov2, jfull)
    g_cov_out = jnp.where(
        good[..., None, None], sb_cov2 * total_w[:, None, None, None], g_cov
    )
    g_mean_out = jnp.where(good[..., None], g_mean.at[..., 3:].set(0.0), g_mean)
    g_w_out = jnp.where(alive, g_w, 0.0)

    new_sdmm = mix.SDMM(weight=w_out, mean=mean_out, cov=cov_out)
    new_em = EMState(
        stats_w=jnp.where(a1, g_w_out, em.stats_w),
        stats_mean=jnp.where(a1[..., None], g_mean_out, em.stats_mean),
        stats_cov=jnp.where(a1[..., None, None], g_cov_out, em.stats_cov),
        total_weight=jnp.where(act, total_w, em.total_weight),
        iterations=em.iterations + act.astype(jnp.int32),
    )
    return new_sdmm, new_em


def _use_pallas_e_step(sdmm) -> bool:
    """The Pallas suff-stats kernel (ops/em_pallas) replaces the chunked
    scan on TPU; it is specialized to K=16 components (sdmm_proc.h:55)."""
    import os

    import jax as _jax

    return (
        _jax.default_backend() not in ("cpu",)
        and sdmm.weight.shape[-1] == 16
        and os.environ.get("SDMM_TPU_NO_EM_KERNEL") != "1"
    )


def em_step(sdmm, em, pos, d, weight, leaf, active, cfg: EMConfig = EMConfig(),
            leaf_ext=None):
    """Full EM iteration: prepare → E-step → M-step. Returns (sdmm, em, prep)."""
    n_leaves = sdmm.weight.shape[0]
    prep = mix.prepare(sdmm)
    if _use_pallas_e_step(sdmm):
        from ..ops import em_pallas

        sw, sm, sc, ws, cnt = em_pallas.e_step_pallas(
            sdmm, prep, pos, d, weight, leaf, n_leaves
        )
    else:
        sw, sm, sc, ws, cnt = e_step(
            sdmm, prep, pos, d, weight, leaf, n_leaves, cfg.batch_size
        )
    new_sdmm, new_em = m_step(sdmm, prep, em, sw, sm, sc, ws, active, cfg,
                              leaf_ext=leaf_ext)
    return new_sdmm, new_em, cnt


def batch_em(sdmm, pos, d, weight, leaf, active, n_iters: int = 8,
             cfg: EMConfig = EMConfig()):
    """Full-batch (non-stepwise) EM (reference: jmm/opt/batch.h) — every
    iteration refits from the complete sample set with no running-stat
    blending: a fresh EMState keeps eta = (lr·0+1)^-alpha = 1 and full MAP
    priors each pass. Used for offline fits (learned-BSDF DMMs,
    checkpointed model refinement); the online path stays stepwise."""
    L, K = sdmm.weight.shape
    for _ in range(n_iters):
        em = init_em_state(L, K)
        sdmm, em, _ = em_step(sdmm, em, pos, d, weight, leaf, active, cfg)
    return sdmm
