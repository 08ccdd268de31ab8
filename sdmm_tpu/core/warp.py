"""Sampling warps: square → hemisphere/sphere/disk/triangle.

TPU-native equivalent of the reference's ``warp.h``
(reference: mitsuba/include/mitsuba/core/warp.h). All functions take uniform
samples ``u`` of shape [..., 2] (or [...]) and are fully batched.
"""

from __future__ import annotations

import jax.numpy as jnp

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_disk_concentric(u: jnp.ndarray) -> jnp.ndarray:
    """Concentric (Shirley) disk mapping; low-distortion."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    cond = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(cond, ox, oy)
    safe_div = jnp.where(
        cond,
        jnp.where(ox != 0.0, oy / jnp.where(ox == 0.0, 1.0, ox), 0.0),
        jnp.where(oy != 0.0, ox / jnp.where(oy == 0.0, 1.0, oy), 0.0),
    )
    theta = jnp.where(
        cond,
        (jnp.pi / 4.0) * safe_div,
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * safe_div,
    )
    r = jnp.where(zero, 0.0, r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def square_to_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere (z up); pdf = cos(theta)/pi."""
    p = square_to_uniform_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - p[..., 0] ** 2 - p[..., 1] ** 2))
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(w[..., 2], 0.0) * INV_PI


def square_to_uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates (b0, b1) uniform over a triangle."""
    su0 = jnp.sqrt(u[..., 0])
    b0 = 1.0 - su0
    b1 = u[..., 1] * su0
    return jnp.stack([b0, b1], axis=-1)


def square_to_std_normal(u: jnp.ndarray) -> jnp.ndarray:
    """Box-Muller: [..., 2] uniforms → [..., 2] standard normals.

    Matches the reference's sampling transform
    (reference: jmm/multivariate_tangent_normal.h:667-676).
    """
    r = jnp.sqrt(jnp.maximum(0.0, -2.0 * jnp.log1p(-jnp.minimum(u[..., 0], 1.0 - 1e-7))))
    theta = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.sin(theta), r * jnp.cos(theta)], axis=-1)
