"""Learned directional mixture models of BSDFs, for product sampling.

Equivalent of the reference's learned-BSDF machinery
(reference: mitsuba/include/mitsuba/render/bsdf.h:298-330 ``BSDF::getDMM``;
mitsuba/src/bsdfs/diffuse.cpp:86-114 loads a fixed DMM from
``diffuse.sdmm``; sdmm_proc.cpp:327-356 rotates it into the world frame;
sdmm::product at :375-381). The reference ships pre-trained ``.sdmm`` JSON
assets (git-lfs stubs here), so this module *fits its own* mixtures to the
analytic BSDFs with a small intrinsic EM on the sphere — same math, no
assets needed.

At render time the per-BSDF mixture (expressed in the local shading frame,
z-up) is rotated into the world tangent frame at each vertex and multiplied
with the position-conditioned guiding mixture.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core import warp
from ..scene.scene import BSDF_DIFFUSE, BSDF_PHONG
from . import mixture as mix
from . import tangent as tg


def fit_directional_mixture(dirs, weights, n_components=4, iters=30, seed=0):
    """Weighted intrinsic EM for a mixture of tangent Gaussians on S².

    dirs: [N, 3] unit vectors; weights: [N] nonneg. Returns
    (w [K], mu [K,3], cov [K,2,2]).
    """
    dirs = jnp.asarray(dirs, dtype=jnp.float32)
    weights = jnp.asarray(weights, dtype=jnp.float32)
    k = n_components
    key = jax.random.PRNGKey(seed)
    # Init: weighted random data points as means, moderate isotropic covs.
    idx = jax.random.choice(key, dirs.shape[0], (k,), replace=False)
    mu = dirs[idx]
    cov = jnp.tile(jnp.eye(2) * 0.25, (k, 1, 1))
    w = jnp.full((k,), 1.0 / k)

    for _ in range(iters):
        rot = tg.make_rotation(mu)  # [K,3,3]
        t, aos, ok = tg.log_map(rot[None], dirs[:, None, :])  # [N,K,2]
        chol = jnp.linalg.cholesky(cov)
        inv_chol = jnp.linalg.inv(chol)
        inv_det = 1.0 / (chol[..., 0, 0] * chol[..., 1, 1])
        z = jnp.einsum("kij,nkj->nki", inv_chol, t)
        pdf = (
            (1.0 / (2 * jnp.pi))
            * jnp.exp(-0.5 * jnp.sum(z * z, axis=-1))
            * inv_det
            * aos
        )
        pdf = jnp.where(ok, pdf, 0.0)
        post = w * pdf
        post = post / jnp.maximum(post.sum(-1, keepdims=True), 1e-20)
        gw = weights[:, None] * post  # [N,K]
        wk = gw.sum(0)
        # Spherical mean then recentre.
        mu_new = jnp.einsum("nk,ni->ki", gw, dirs)
        mu_new = mu_new / jnp.maximum(
            jnp.linalg.norm(mu_new, axis=-1, keepdims=True), 1e-12
        )
        rot_new = tg.make_rotation(mu_new)
        t_new, _, _ = tg.log_map(rot_new[None], dirs[:, None, :])
        cov_new = jnp.einsum("nk,nki,nkj->kij", gw, t_new, t_new) / jnp.maximum(
            wk[:, None, None], 1e-12
        )
        cov_new = cov_new + jnp.eye(2) * 1e-4
        mu = mu_new
        cov = cov_new
        w = wk / jnp.maximum(wk.sum(), 1e-20)
    return np.asarray(w), np.asarray(mu), np.asarray(cov)


@lru_cache(maxsize=8)
def cosine_dmm(n_components: int = 4, n_samples: int = 20000):
    """Fixed DMM of the cosine lobe around +z (the reference's diffuse.sdmm
    analog, reference: diffuse.cpp:86-114)."""
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (n_samples, 2))
    d = warp.square_to_cosine_hemisphere(u)
    w = jnp.ones((n_samples,))
    return fit_directional_mixture(d, w, n_components)


@lru_cache(maxsize=32)
def phong_lobe_dmm(exponent: float, n_components: int = 4, n_samples: int = 20000):
    """DMM of a power-cosine lobe around +z (rotated to reflect(wi) at
    runtime, like the reference's phong DMM)."""
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (n_samples, 2))
    cos_a = jnp.power(u[:, 0], 1.0 / (exponent + 1.0))
    sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a**2))
    phi = 2 * jnp.pi * u[:, 1]
    d = jnp.stack([sin_a * jnp.cos(phi), sin_a * jnp.sin(phi), cos_a], axis=-1)
    return fit_directional_mixture(d, jnp.ones((n_samples,)), n_components)


def build_learned_table(scene, n_components: int = 4):
    """Per-scene-BSDF learned mixtures in the LOCAL frame.

    Returns dict of arrays: has [B], mode [B] (0=orient to normal,
    1=orient to reflect(wi)), weight [B,Kb], mu_local [B,Kb,3],
    cov [B,Kb,2,2].
    """
    btypes = np.asarray(scene.bsdf_type)
    exps = np.asarray(scene.bsdf_exponent)
    b = len(btypes)
    kb = n_components
    has = np.zeros(b, bool)
    mode = np.zeros(b, np.int32)
    weight = np.zeros((b, kb), np.float32)
    mu = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (b, kb, 1))
    cov = np.tile(np.eye(2, dtype=np.float32) * 0.5, (b, kb, 1, 1))
    for i in range(b):
        if btypes[i] == BSDF_DIFFUSE:
            w_, m_, c_ = cosine_dmm(kb)
            has[i], mode[i] = True, 0
            weight[i], mu[i], cov[i] = w_, m_, c_
        elif btypes[i] == BSDF_PHONG:
            w_, m_, c_ = phong_lobe_dmm(float(round(float(exps[i]), 1)), kb)
            has[i], mode[i] = True, 1
            weight[i], mu[i], cov[i] = w_, m_, c_
    return {
        "has": jnp.asarray(has),
        "mode": jnp.asarray(mode),
        "weight": jnp.asarray(weight),
        "mu_local": jnp.asarray(mu),
        "cov": jnp.asarray(cov),
    }


def to_world_conditional(table, bsdf_idx, s_ax, t_ax, n_ax, wi_local):
    """Gather + rotate learned mixtures into world frame as a Conditional.

    Orientation: mode 0 → z axis maps to shading normal (diffuse,
    reference sdmm_proc.cpp:335-339); mode 1 → z maps to the world
    reflection direction (phong).
    """
    from ..core.frame import reflect, to_world

    has = table["has"][bsdf_idx]
    mode = table["mode"][bsdf_idx]
    w = table["weight"][bsdf_idx]
    mu_l = table["mu_local"][bsdf_idx]
    cov = table["cov"][bsdf_idx]

    # Local z-target: normal (mode 0) or reflect(wi) (mode 1).
    z_loc = jnp.where(
        (mode == 1)[..., None],
        reflect(wi_local),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi_local.shape),
    )
    # Build local orientation frame around z_loc, then map to world.
    from ..core.frame import coordinate_system

    s2, t2 = coordinate_system(z_loc)
    # Component mean in oriented local frame: mu_l expressed w.r.t. z-up →
    # rotate so +z ↦ z_loc.
    mu_orient = (
        mu_l[..., 0:1] * s2[..., None, :]
        + mu_l[..., 1:2] * t2[..., None, :]
        + mu_l[..., 2:3] * z_loc[..., None, :]
    )
    # Local → world.
    mu_world = to_world(
        s_ax[..., None, :], t_ax[..., None, :], n_ax[..., None, :], mu_orient
    )
    rot = tg.make_rotation(mu_world)
    chol = jnp.linalg.cholesky(cov)
    inv_chol = jnp.linalg.inv(chol)
    inv_det = 1.0 / jnp.maximum(
        chol[..., 0, 0] * chol[..., 1, 1], 1e-12
    )
    return mix.Conditional(
        weight=jnp.where(has[..., None], w, 0.0),
        mu_dir=mu_world,
        rot=rot,
        chol=chol,
        inv_chol=inv_chol,
        inv_det=inv_det,
        valid=has,
    ), has
