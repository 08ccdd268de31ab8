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
from ..scene.scene import BSDF_DIFFUSE, BSDF_PHONG, BSDF_ROUGHCONDUCTOR
from . import mixture as mix
from . import tangent as tg

N_THETA_BINS = 8  # incidence-angle conditioning for glossy lobes
# (the reference conditions 4-D mixtures on (theta_i, alpha):
# roughconductor.cpp:176-243 create_conditional_pruned)

# BSDF types with generic self-fit hooks (reference: getDMM overrides in
# roughplastic.cpp, roughdielectric.cpp, blendbsdf.cpp).
from ..scene.scene import (  # noqa: E402
    BSDF_BLEND,
    BSDF_ROUGHDIELECTRIC,
    BSDF_ROUGHPLASTIC,
)

_GENERIC_HOOKED = {
    int(BSDF_ROUGHPLASTIC), int(BSDF_ROUGHDIELECTRIC), int(BSDF_BLEND),
}

# Conditional pruning: the reference keeps the top-k components of the
# learned conditional before the product (create_conditional_pruned with
# top_k = 2, roughconductor.cpp:192, roughplastic.cpp:223).
PRODUCT_TOP_K = 2


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
def roughconductor_dmm(alpha: float, n_components: int = 4, n_samples: int = 12000):
    """Incidence-conditioned DMMs of the GGX reflection lobe.

    Returns (w [NB,K], mu [NB,K,3], cov [NB,K,2,2]) — one directional
    mixture per theta_i bin, fitted to VNDF-sampled, weight-importance
    reflection directions for wi in the local xz-plane. The runtime rotates
    by wi's azimuth (TPU analog of the reference's 4-D conditional DMMs).
    """
    from .. import bsdf as bsdf_mod

    ws, mus, covs = [], [], []
    for b in range(N_THETA_BINS):
        theta = (b + 0.5) / N_THETA_BINS * (jnp.pi / 2)
        wi = jnp.tile(
            jnp.asarray([jnp.sin(theta), 0.0, jnp.cos(theta)]), (n_samples, 1)
        )
        params = {
            "type": jnp.full((n_samples,), BSDF_ROUGHCONDUCTOR, jnp.int32),
            "albedo": jnp.ones((n_samples, 3)),
            "specular": jnp.ones((n_samples, 3)),
            "alpha": jnp.full((n_samples,), alpha),
            "eta": jnp.zeros((n_samples,)),
            "k": jnp.ones((n_samples, 3)),
            "exponent": jnp.full((n_samples,), 30.0),
        }
        key = jax.random.PRNGKey(100 + b)
        u1 = jax.random.uniform(key, (n_samples,))
        u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n_samples, 2))
        bs = bsdf_mod.sample(params, wi, u1, u2, types=(BSDF_ROUGHCONDUCTOR,))
        w_samp = jnp.max(bs["weight"], axis=-1)
        ok = w_samp > 0
        w_, m_, c_ = fit_directional_mixture(
            bs["wo"], jnp.where(ok, w_samp, 0.0), n_components, iters=25, seed=b
        )
        ws.append(w_)
        mus.append(m_)
        covs.append(c_)
    return np.stack(ws), np.stack(mus), np.stack(covs)


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


def scene_bsdf_dmm(scene, bsdf_id: int, n_components: int = 4,
                   n_samples: int = 12000):
    """Incidence-conditioned DMMs fitted to an arbitrary scene BSDF by
    sampling it directly (texture/child params resolved through
    gather_params). TPU analog of the reference's pre-trained
    (theta_i, ...)-conditioned SDMMs for roughplastic (conditions on
    theta/alpha/eta, roughplastic.cpp:212-225), roughdielectric
    (roughdielectric.cpp:198) and blendbsdf (conditions on theta/weight,
    blendbsdf.cpp:87-101): instead of conditioning a trained 4/5-D
    mixture, each theta_i bin gets its own self-fit 2-D directional
    mixture — the scene's actual parameter values are baked in. Delta
    lobes are excluded (product sampling never applies to them).

    Returns (w [NB,K], mu [NB,K,3], cov [NB,K,2,2]).
    """
    from .. import bsdf as bsdf_mod

    types = tuple(sorted({int(t) for t in np.asarray(scene.bsdf_type)}))
    idx = jnp.full((n_samples,), int(bsdf_id), jnp.int32)
    uv = jnp.full((n_samples, 2), 0.5)
    params = bsdf_mod.gather_params(scene, idx, uv, types=types)
    ws, mus, covs = [], [], []
    for b in range(N_THETA_BINS):
        theta = (b + 0.5) / N_THETA_BINS * (jnp.pi / 2)
        wi = jnp.tile(
            jnp.asarray([jnp.sin(theta), 0.0, jnp.cos(theta)]), (n_samples, 1)
        )
        key = jax.random.PRNGKey(1000 + 17 * int(bsdf_id) + b)
        u0 = jax.random.uniform(key, (n_samples,))
        u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n_samples,))
        u2 = jax.random.uniform(jax.random.fold_in(key, 2), (n_samples, 2))
        bs = bsdf_mod.sample_full(params, wi, u0, u1, u2, types=types)
        w_samp = jnp.max(bs["weight"], axis=-1)
        ok = (w_samp > 0) & ~bs["delta"]
        w_, m_, c_ = fit_directional_mixture(
            bs["wo"], jnp.where(ok, w_samp, 0.0), n_components,
            iters=25, seed=int(bsdf_id),
        )
        ws.append(w_)
        mus.append(m_)
        covs.append(c_)
    return np.stack(ws), np.stack(mus), np.stack(covs)


def build_learned_table(scene, n_components: int = 4):
    """Per-scene-BSDF learned mixtures in the LOCAL frame.

    Arrays carry a theta_i-bin axis: weight [B,NB,Kb], mu_local
    [B,NB,Kb,3], cov [B,NB,Kb,2,2]. Unconditioned models (diffuse/phong)
    replicate their single mixture across bins. mode: 0 = orient to the
    shading normal, 1 = orient to reflect(wi), 2 = theta-binned +
    azimuth-rotated (rough conductor).
    """
    btypes = np.asarray(scene.bsdf_type)
    exps = np.asarray(scene.bsdf_exponent)
    alphas = np.asarray(scene.bsdf_alpha)
    b = len(btypes)
    kb = n_components
    nb = N_THETA_BINS
    has = np.zeros(b, bool)
    mode = np.zeros(b, np.int32)
    weight = np.zeros((b, nb, kb), np.float32)
    mu = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (b, nb, kb, 1))
    cov = np.tile(np.eye(2, dtype=np.float32) * 0.5, (b, nb, kb, 1, 1))
    for i in range(b):
        if btypes[i] == BSDF_DIFFUSE:
            w_, m_, c_ = cosine_dmm(kb)
            has[i], mode[i] = True, 0
            weight[i], mu[i], cov[i] = w_[None], m_[None], c_[None]
        elif btypes[i] == BSDF_PHONG:
            w_, m_, c_ = phong_lobe_dmm(float(round(float(exps[i]), 1)), kb)
            has[i], mode[i] = True, 1
            weight[i], mu[i], cov[i] = w_[None], m_[None], c_[None]
        elif btypes[i] == BSDF_ROUGHCONDUCTOR:
            w_, m_, c_ = roughconductor_dmm(float(round(float(alphas[i]), 3)), kb)
            has[i], mode[i] = True, 2
            weight[i], mu[i], cov[i] = w_, m_, c_
        elif int(btypes[i]) in _GENERIC_HOOKED:
            # roughplastic / roughdielectric / blend: theta-binned self-fit
            # of the actual scene BSDF (reference getDMM hooks:
            # roughplastic.cpp:212, roughdielectric.cpp:198,
            # blendbsdf.cpp:87; twosided flips the frame, twosided.cpp:139
            # — implicit here since mixtures orient to the flipped shading
            # frame).
            w_, m_, c_ = scene_bsdf_dmm(scene, i, kb)
            has[i], mode[i] = True, 2
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
    # theta_i bin (mode 2); unconditioned entries replicate bin 0.
    cos_i = jnp.clip(jnp.abs(wi_local[..., 2]), 0.0, 1.0)
    theta = jnp.arccos(cos_i)
    tbin = jnp.clip(
        (theta / (jnp.pi / 2) * N_THETA_BINS).astype(jnp.int32), 0, N_THETA_BINS - 1
    )
    tbin = jnp.where(mode == 2, tbin, 0)
    w = table["weight"][bsdf_idx, tbin]
    mu_l = table["mu_local"][bsdf_idx, tbin]
    cov = table["cov"][bsdf_idx, tbin]
    # Mode 2: the mixture was fitted with wi in the xz-plane — rotate it
    # around local z by wi's azimuth.
    phi = jnp.arctan2(wi_local[..., 1], wi_local[..., 0])
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    mu_rot = jnp.stack(
        [
            cphi[..., None] * mu_l[..., 0] - sphi[..., None] * mu_l[..., 1],
            sphi[..., None] * mu_l[..., 0] + cphi[..., None] * mu_l[..., 1],
            mu_l[..., 2],
        ],
        axis=-1,
    )
    mu_l = jnp.where((mode == 2)[..., None, None], mu_rot, mu_l)

    # Local z-target: normal (modes 0 and 2) or reflect(wi) (mode 1).
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
