"""Mixture initialization for tree leaves.

Equivalent of ``sdmm::initialize`` (reference: volpath_sdmm.cpp:132-138 —
K/8 spatial clusters at spatial_distance = 3·maxDiag/n_spatial; directional
structure per cluster) and jmm's uniform init strategies
(jmm/mixture_model_init.h:37,86). TPU-native version: deterministic
stratified init from the leaf's AABB — spatial groups jittered inside the
leaf, each carrying a ring of directions over the sphere — vectorized over
all leaves at once (no per-leaf data gathering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mixture import SDMM


def _sphere_dirs(n: int) -> np.ndarray:
    """Fibonacci-spiral directions covering S²."""
    i = np.arange(n) + 0.5
    phi = np.pi * (1.0 + 5.0**0.5) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def init_leaf_params(
    key,
    leaf_lo: jnp.ndarray,  # [L, 3]
    leaf_hi: jnp.ndarray,  # [L, 3]
    n_components: int = 16,
    n_spatial: int = 2,
    dir_std: float = 1.0,
) -> SDMM:
    """Initial mixtures for all L leaf slots."""
    L = leaf_lo.shape[0]
    K = n_components
    per = K // n_spatial
    dirs = jnp.asarray(_sphere_dirs(per), dtype=jnp.float32)  # [per, 3]
    dirs = jnp.tile(dirs, (n_spatial, 1))  # [K, 3]

    k1, k2 = jax.random.split(key)
    # Spatial group centers stratified inside the leaf.
    centers = jax.random.uniform(
        k1, (L, n_spatial, 3), minval=0.25, maxval=0.75
    )
    centers = leaf_lo[:, None, :] + centers * (leaf_hi - leaf_lo)[:, None, :]
    pos = jnp.repeat(centers, per, axis=1)  # [L, K, 3]
    # Small directional jitter so components are not identical across leaves.
    jit = jax.random.normal(k2, (L, K, 3)) * 0.05
    d = dirs[None] + jit
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    mean = jnp.concatenate([pos, d], axis=-1)
    ext = leaf_hi - leaf_lo  # [L, 3]
    spatial_std = jnp.maximum(ext * 0.35, 1e-4)  # covers the leaf
    cov = jnp.zeros((L, K, 5, 5))
    cov = cov.at[..., 0, 0].set((spatial_std[:, None, 0]) ** 2)
    cov = cov.at[..., 1, 1].set((spatial_std[:, None, 1]) ** 2)
    cov = cov.at[..., 2, 2].set((spatial_std[:, None, 2]) ** 2)
    cov = cov.at[..., 3, 3].set(dir_std**2)
    cov = cov.at[..., 4, 4].set(dir_std**2)

    weight = jnp.full((L, K), 1.0 / K)
    return SDMM(weight=weight, mean=mean, cov=cov)


def _segment_argmax(score: jnp.ndarray, leaf: jnp.ndarray, n_leaves: int):
    """Index of the max-score sample per leaf; n_samples marks empty leaves."""
    s = score.shape[0]
    mx = jax.ops.segment_max(score, leaf, num_segments=n_leaves)
    is_max = jnp.isfinite(score) & (score >= mx[leaf])
    idx = jnp.where(is_max, jnp.arange(s, dtype=jnp.int32), s)
    return jax.ops.segment_min(idx, leaf, num_segments=n_leaves)


def kmeanspp_centers(key, pos: jnp.ndarray, leaf: jnp.ndarray,
                     valid: jnp.ndarray, n_leaves: int, n_centers: int):
    """Batched per-leaf k-means++ seeding (reference: kMeansPPInit,
    jmm/mixture_model_init.h:245).

    All leaves are seeded at once: the classic 'sample ∝ min-distance²'
    draw becomes a Gumbel-max over log(d_min²) within each leaf segment —
    no per-leaf loops, no kd-trees. Returns (centers [L, C, 3],
    has_center [L] bool).
    """
    s = pos.shape[0]
    neg_inf = jnp.float32(-jnp.inf)
    centers = []
    g0 = jax.random.gumbel(key, (s,))
    sel = _segment_argmax(jnp.where(valid, g0, neg_inf), leaf, n_leaves)
    has = sel < s
    c = pos[jnp.minimum(sel, s - 1)]
    centers.append(c)
    d_min = jnp.sum((pos - c[leaf]) ** 2, axis=-1)
    for j in range(1, n_centers):
        gj = jax.random.gumbel(jax.random.fold_in(key, j), (s,))
        score = jnp.where(
            valid & (d_min > 0.0), jnp.log(jnp.maximum(d_min, 1e-30)) + gj, neg_inf
        )
        sel = _segment_argmax(score, leaf, n_leaves)
        # Leaves with no remaining distinct sample reuse the previous center.
        c_j = jnp.where((sel < s)[:, None], pos[jnp.minimum(sel, s - 1)], c)
        centers.append(c_j)
        d_min = jnp.minimum(d_min, jnp.sum((pos - c_j[leaf]) ** 2, axis=-1))
        c = c_j
    return jnp.stack(centers, axis=1), has


def reseed_spatial_means(sdmm: SDMM, centers: jnp.ndarray, reseed: jnp.ndarray,
                         n_spatial: int) -> SDMM:
    """Replace the spatial part of leaf means with k-means++ centers
    (directional structure and covariances keep the stratified init).
    centers: [L, n_spatial, 3]; reseed: [L] bool."""
    L, K = sdmm.weight.shape
    per = K // n_spatial
    pos = jnp.repeat(centers, per, axis=1)[:, :K]  # [L, K, 3]
    mean = sdmm.mean.at[..., :3].set(
        jnp.where(reseed[:, None, None], pos, sdmm.mean[..., :3])
    )
    return SDMM(weight=sdmm.weight, mean=mean, cov=sdmm.cov)
