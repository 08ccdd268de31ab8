"""GGX microfacet distribution with Smith shadowing and VNDF sampling.

Replaces the reference's MicrofacetDistribution
(reference: mitsuba/src/libcore — microfacet.h used by
mitsuba/src/bsdfs/roughconductor.cpp). Sampling uses visible-normal sampling
(Heitz 2018), matching the reference's sampleVisible=true default; all
functions operate on local-frame direction batches [..., 3].
"""

from __future__ import annotations

import jax.numpy as jnp


def ggx_ndf(m: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Isotropic GGX D(m); m in local frame."""
    cos_t = jnp.maximum(m[..., 2], 0.0)
    a2 = alpha * alpha
    denom = cos_t * cos_t * (a2 - 1.0) + 1.0
    return jnp.where(cos_t > 0.0, a2 / jnp.maximum(jnp.pi * denom * denom, 1e-20), 0.0)


def smith_g1(v: jnp.ndarray, m: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    cos_v = v[..., 2]
    # Only shadowing when v and m on the same side.
    chi = jnp.sum(v * m, axis=-1) * cos_v > 0.0
    cos2 = cos_v * cos_v
    tan2 = jnp.maximum(1.0 - cos2, 0.0) / jnp.maximum(cos2, 1e-12)
    lam = 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)
    return jnp.where(chi, 1.0 / (1.0 + lam), 0.0)


def sample_vndf(wi: jnp.ndarray, alpha: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample the GGX distribution of visible normals (Heitz 2018)."""
    # Stretch view vector.
    v = jnp.stack(
        [alpha * wi[..., 0], alpha * wi[..., 1], wi[..., 2]], axis=-1
    )
    # Double-where guards: the unselected branches of the wheres below
    # must stay NaN/inf-free under reverse-mode AD w.r.t. alpha
    # (d inv_sqrt at the epsilon floor otherwise overflows and poisons
    # the masked branch — the classic where-gradient trap).
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.where(vn > 1e-12, vn, 1.0)
    # Orthonormal basis around v.
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    len_safe = jnp.where(lensq > 1e-12, lensq, 1.0)
    inv_len = 1.0 / jnp.sqrt(len_safe)
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * inv_len, v[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape),
    )
    t2 = jnp.cross(v, t1)
    # Parameterize projected area.
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    n = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    # Unstretch.
    m = jnp.stack(
        [alpha * n[..., 0], alpha * n[..., 1], jnp.maximum(n[..., 2], 0.0)], axis=-1
    )
    mn = jnp.linalg.norm(m, axis=-1, keepdims=True)
    return m / jnp.where(mn > 1e-12, mn, 1.0)


def vndf_pdf(wi: jnp.ndarray, m: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """pdf of sample_vndf in the half-vector measure."""
    g1 = smith_g1(wi, m, alpha)
    d = ggx_ndf(m, alpha)
    return g1 * jnp.abs(jnp.sum(wi * m, axis=-1)) * d / jnp.maximum(
        jnp.abs(wi[..., 2]), 1e-12
    )
