"""SVD component splitting for the batched stepwise EM.

TPU-native equivalent of the reference's optional split pass
(spec: jmm/opt/stepwise_tangent.h splitSVD:489-527, splitStatsSVD:529-595):
a component is split along the dominant *directional* axis of its
covariance (the split direction's spatial rows are zeroed), producing two
children that exactly preserve the parent's first two moments with the
reference's constants (split weight 1/2, offset u = 1/2, beta = 1/2 —
children at mean +- u*a, cov - u^2 a a^T where a is the leading scaled
singular vector).

Redesign for TPU: instead of growing the component count in place (the
reference bumps nComponents), every leaf picks its single best split
candidate and moves one child into a *dead slot* (weight == 0) — all
leaves split simultaneously as one batched [L, K] update, no dynamic
shapes. Leaves without a dead slot, or whose best candidate scores below
the threshold, are left untouched.
"""

from __future__ import annotations


import jax.numpy as jnp

from . import mixture as mix
from . import tangent as tg
from .em import EMState

SPLIT_WEIGHT = 0.5  # weightSplitWeight (stepwise_tangent.h:487)
SPLIT_U = 0.5


def _leading_scaled_axis(cov):
    """Leading column of U sqrt(S) per component (split axis a_l)."""
    u, s, _ = jnp.linalg.svd(cov)  # batched over [L, K]
    return u[..., :, 0] * jnp.sqrt(jnp.maximum(s[..., 0:1], 0.0))


def svd_split(sdmm: mix.SDMM, em: EMState, active: jnp.ndarray,
              min_score: float = 1e-3):
    """One batched split round. Returns (sdmm, em, did_split [L] bool).

    active [L]: leaves eligible this round. Score = weight * directional
    covariance mass of the split axis; the leaf's argmax component splits
    into its lowest-weight dead slot if score > min_score.
    """
    L, K = sdmm.weight.shape
    alive = sdmm.weight > 0.0

    a = _leading_scaled_axis(sdmm.cov)  # [L, K, 5]
    a = a.at[..., :3].set(0.0)  # directional-only split (ref zeroes topRows(3))
    a_mass = jnp.sum(a * a, axis=-1)  # [L, K] directional variance along axis
    score = jnp.where(alive, sdmm.weight * a_mass, -1.0)
    j = jnp.argmax(score, axis=-1)  # [L] component to split
    best = jnp.take_along_axis(score, j[:, None], axis=-1)[:, 0]

    # Dead slot: lowest-weight component with weight == 0.
    dead_rank = jnp.where(alive, jnp.inf, jnp.arange(K)[None, :].astype(jnp.float32))
    k = jnp.argmin(dead_rank, axis=-1)  # [L]
    has_dead = jnp.any(~alive, axis=-1)
    do = active & has_dead & (best > min_score)

    ar = jnp.arange(L)
    a_j = a[ar, j]  # [L, 5]
    w_j = sdmm.weight[ar, j]
    mean_j = sdmm.mean[ar, j]  # [L, 6] embedded
    cov_j = sdmm.cov[ar, j]

    # Children (exact moment-preserving split with the ref's constants):
    # tangent means 0 -+ u*a (parent's own tangent frame), covs cov - u^2 aa^T.
    rot = tg.make_rotation(mean_j[..., 3:6])  # [L, 3, 3]
    t_off = SPLIT_U * a_j[..., 3:5]
    dir_a, _, ok_a = tg.exp_map(rot, -t_off)
    dir_b, _, ok_b = tg.exp_map(rot, t_off)
    # Spatial offset is zero (a's spatial rows are zeroed), so positions stay.
    mean_a = jnp.concatenate([mean_j[..., :3], dir_a], axis=-1)
    mean_b = jnp.concatenate([mean_j[..., :3], dir_b], axis=-1)
    cov_c = cov_j - (SPLIT_U * SPLIT_U) * a_j[..., :, None] * a_j[..., None, :]
    # Keep the diagonal comfortably PD after the rank-1 subtraction.
    cov_c = cov_c + 1e-8 * jnp.eye(5)
    do = do & ok_a & ok_b

    w_half = 0.5 * w_j

    def put(arr, idx, val):
        return arr.at[ar, idx].set(jnp.where(
            do.reshape((L,) + (1,) * (val.ndim - 1)), val, arr[ar, idx]
        ))

    weight = put(put(sdmm.weight, j, w_half), k, w_half)
    mean = put(put(sdmm.mean, j, mean_a), k, mean_b)
    cov = put(put(sdmm.cov, j, cov_c), k, cov_c)
    # Renormalization is a no-op (children sum to the parent weight).
    new_sdmm = mix.SDMM(weight=weight, mean=mean, cov=cov)

    # Running stats: halve the parent's mass; children's stats follow the
    # m_step convention (directional tangent mean re-centred to 0 in each
    # child's own frame; covariance stats = w * (cov + mean~ mean~^T) with
    # mean~ = (spatial mean, 0, 0)) — splitStatsSVD:584-592 restated in
    # this module's per-component frames.
    sw_j = em.stats_w[ar, j]
    sw_half = 0.5 * sw_j
    m_sp = mean_j[..., :3]
    m_tilde = jnp.concatenate([m_sp, jnp.zeros_like(m_sp[..., :2])], axis=-1)
    sm_child = sw_half[..., None] * m_tilde
    sc_child = sw_half[..., None, None] * (
        cov_c + m_tilde[..., :, None] * m_tilde[..., None, :]
    )
    stats_w = put(put(em.stats_w, j, sw_half), k, sw_half)
    stats_mean = put(put(em.stats_mean, j, sm_child), k, sm_child)
    stats_cov = put(put(em.stats_cov, j, sc_child), k, sc_child)
    new_em = EMState(
        stats_w=stats_w, stats_mean=stats_mean, stats_cov=stats_cov,
        total_weight=em.total_weight, iterations=em.iterations,
    )
    return new_sdmm, new_em, do
