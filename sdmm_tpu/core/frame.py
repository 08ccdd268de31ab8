"""Orthonormal frames and coordinate systems.

TPU-native equivalent of the reference's ``Frame`` / ``coordinateSystem``
(reference: mitsuba/include/mitsuba/core/frame.h and
mitsuba/src/libcore/util.cpp ``coordinateSystem``). All functions are
vectorized over leading batch dimensions: vectors are arrays ``[..., 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def coordinate_system(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless orthonormal basis around unit normal ``n`` (Duff et al. 2017).

    Returns tangent vectors ``(s, t)`` such that ``(s, t, n)`` is a
    right-handed orthonormal frame. Works for batched ``n`` of shape [..., 3].
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


def rotation_to_world(n: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation with columns (s, t, n): maps local (z-up) to world.

    Equivalent to the reference tangent-space rotation built from the mean
    direction (reference: jmm/multivariate_tangent_normal.h:49-58).
    Shape: [..., 3, 3].
    """
    s, t = coordinate_system(n)
    return jnp.stack([s, t, n], axis=-1)


def to_local(s: jnp.ndarray, t: jnp.ndarray, n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """World → local coordinates for frame (s, t, n)."""
    return jnp.stack(
        [
            jnp.sum(v * s, axis=-1),
            jnp.sum(v * t, axis=-1),
            jnp.sum(v * n, axis=-1),
        ],
        axis=-1,
    )


def to_world(s: jnp.ndarray, t: jnp.ndarray, n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Local → world coordinates for frame (s, t, n)."""
    return (
        v[..., 0:1] * s + v[..., 1:2] * t + v[..., 2:3] * n
    )


def cos_theta(v: jnp.ndarray) -> jnp.ndarray:
    """Cosine of angle with the local frame normal (z axis)."""
    return v[..., 2]


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalization of [..., 3] vectors."""
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps)))


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(wi: jnp.ndarray) -> jnp.ndarray:
    """Specular reflection in the local frame (z = normal)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
