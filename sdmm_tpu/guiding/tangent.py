"""Tangent-space (exp/log) maps on S² with analytic Jacobians.

The mathematical spec is the reference's readable Eigen implementation
(reference: mitsuba/src/integrators/dmm/jmm/multivariate_tangent_normal.h:
TangentSpace::exp :93, ::log :146, expJacobian :179, logJacobian :211); the
missing `sdmm` submodule implements the same maps in enoki. Here everything
is batched over arbitrary leading dimensions and fully differentiable.

Conventions: a tangent frame at unit mean direction μ is the rotation
R = [s t μ] (columns) built deterministically from μ
(frame.rotation_to_world). ``rel`` denotes coordinates in the north-pole
frame (R^T · world).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import rotation_to_world

_SINC_EPS = 1e-4


def _sinc(x):
    """sin(x)/x, accurate near 0."""
    small = jnp.abs(x) < _SINC_EPS
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(safe) / safe)


def exp_map(rot: jnp.ndarray, tangent: jnp.ndarray):
    """Tangent coords [..., 2] → unit direction [..., 3].

    Returns (dir, sinc_jacobian, valid); valid = |t| < π.
    """
    length = jnp.sqrt(jnp.maximum(jnp.sum(tangent * tangent, axis=-1), 0.0))
    valid = length < jnp.pi
    s = _sinc(length)
    rel = jnp.stack(
        [tangent[..., 0] * s, tangent[..., 1] * s, jnp.cos(length)], axis=-1
    )
    d = jnp.einsum("...ij,...j->...i", rot, rel)
    return d, s, valid


def log_map(rot: jnp.ndarray, d: jnp.ndarray):
    """Unit direction [..., 3] → tangent coords [..., 2].

    Returns (tangent, angle_over_sin_jacobian, valid); valid excludes the
    antipode (cos ≤ −1) and zero directions.
    """
    rel = jnp.einsum("...ji,...j->...i", rot, d)
    cos_a = jnp.clip(rel[..., 2], -1.0, 1.0)
    valid = (cos_a > -1.0 + 1e-7) & (jnp.sum(d * d, axis=-1) > 0.0)
    angle = jnp.arccos(cos_a)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    aos = jnp.where(sin_a < 1e-3, 1.0, angle / jnp.maximum(sin_a, 1e-12))
    tangent = rel[..., :2] * aos[..., None]
    return tangent, aos, valid


def exp_jacobian(tangent: jnp.ndarray) -> jnp.ndarray:
    """d(rel)/d(tangent): [..., 3, 2] in the north-pole frame.

    Spec: jmm/multivariate_tangent_normal.h:179-209.
    """
    t0 = tangent[..., 0]
    t1 = tangent[..., 1]
    l2 = t0 * t0 + t1 * t1
    length = jnp.sqrt(jnp.maximum(l2, 0.0))
    zero = length < 1e-6
    c = jnp.cos(length)
    s = _sinc(length)
    # (cos − sinc)/l² → −1/3 as l → 0.
    cms = jnp.where(zero, -1.0 / 3.0, (c - s) / jnp.maximum(l2, 1e-20))
    j00 = s + t0 * t0 * cms
    j11 = s + t1 * t1 * cms
    joff = t0 * t1 * cms
    j20 = -t0 * s
    j21 = -t1 * s
    row0 = jnp.stack([j00, joff], axis=-1)
    row1 = jnp.stack([joff, j11], axis=-1)
    row2 = jnp.stack([j20, j21], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def log_jacobian(rot: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """d(tangent)/d(rel) · R^T collapsed: [..., 2, 3] taking world directions.

    Returns the full chain d(tangent)/d(world) = J_log(rel) · R^T so callers
    compose directly. Spec: jmm/multivariate_tangent_normal.h:211-247 (which
    returns the north-pole-frame Jacobian; the rotation is composed at the
    call sites, e.g. covIntoTangentSpace :555-569).
    """
    rel = jnp.einsum("...ji,...j->...i", rot, d)
    cos_a = jnp.clip(rel[..., 2], -1.0, 1.0)
    at_pole = cos_a > 1.0 - 1e-7
    angle = jnp.arccos(jnp.where(at_pole, 0.0, cos_a))
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    aos = jnp.where(at_pole, 1.0, angle / jnp.maximum(sin_a, 1e-12))
    inv_sin2 = 1.0 / jnp.maximum(1.0 - cos_a * cos_a, 1e-12)
    off = (cos_a * aos - 1.0) * inv_sin2
    j02 = jnp.where(at_pole, 0.0, rel[..., 0] * off)
    j12 = jnp.where(at_pole, 0.0, rel[..., 1] * off)
    zeros = jnp.zeros_like(aos)
    row0 = jnp.stack([aos, zeros, j02], axis=-1)
    row1 = jnp.stack([zeros, aos, j12], axis=-1)
    j_np = jnp.stack([row0, row1], axis=-2)  # [..., 2, 3]
    return jnp.einsum("...ij,...kj->...ik", j_np, rot)


def make_rotation(mu_dir: jnp.ndarray) -> jnp.ndarray:
    """Tangent-frame rotation at mean direction (columns s, t, μ)."""
    return rotation_to_world(mu_dir)
