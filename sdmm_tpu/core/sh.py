"""Real spherical harmonics (fixed-order, batched, jit-friendly).

TPU-native counterpart of the reference's SH machinery
(reference: mitsuba/include/mitsuba/core/shvector.h — SHVector basis
evaluation, projection, dot products, convolution; used by sky/irradiance
code). Coefficients are flat [-l..l per band] vectors of length (L+1)^2,
matching the reference's addressing `operator()(l, m)`.

Design notes: band count is static (python int) so everything unrolls
into closed-form associated-Legendre recurrences over [N] batches — no
per-sample control flow, pure VPU arithmetic under jit.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "n_coeffs", "eval_basis", "eval_function", "project", "project_dirs",
    "dot", "convolve_cosine", "rotate_z", "lambda_l",
]


def n_coeffs(order: int) -> int:
    """Number of coefficients for bands 0..order inclusive."""
    return (order + 1) * (order + 1)


def _k(l: int, m: int) -> float:
    """SH normalization constant K_l^m."""
    am = abs(m)
    num = (2 * l + 1) * math.factorial(l - am)
    den = 4.0 * math.pi * math.factorial(l + am)
    return math.sqrt(num / den)


@partial(jax.jit, static_argnames=("order",))
def eval_basis(d: jnp.ndarray, order: int) -> jnp.ndarray:
    """Evaluate all real SH basis functions at unit directions d [..., 3].

    Returns [..., (order+1)^2] with the reference's (l, m) flat layout
    (z = cos(theta); azimuth measured from +x toward +y, as
    shvector.h's eval(theta, phi)).
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    # Associated Legendre P_l^m(z) by recurrence, m >= 0, unrolled.
    s2 = jnp.maximum(1.0 - z * z, 0.0)
    s = jnp.sqrt(s2)  # sin(theta)
    # cos(m phi), sin(m phi) via Chebyshev recurrence on the *unscaled*
    # azimuth direction: cos(phi) = x/s, sin(phi) = y/s. To stay finite at
    # the poles we fold the sin(theta)^m factor of P_l^m into the azimuth
    # terms: cm[m] = s^m cos(m phi), sm[m] = s^m sin(m phi) satisfy the
    # same recurrence driven by (x, y) directly.
    cm = [jnp.ones_like(x), x]
    sm = [jnp.zeros_like(x), y]
    for m in range(2, order + 1):
        cm.append(x * cm[m - 1] - y * sm[m - 1])
        sm.append(x * sm[m - 1] + y * cm[m - 1])

    # Q_l^m = P_l^m / sin(theta)^m (polynomial in z): removes the pole
    # singularity; the s^m factor lives in cm/sm above.
    # Recurrences: Q_m^m = (2m-1)!! ; Q_{m+1}^m = z (2m+1) Q_m^m ;
    # (l-m) Q_l^m = z (2l-1) Q_{l-1}^m - (l+m-1) Q_{l-2}^m.
    q = {}
    q[(0, 0)] = jnp.ones_like(z)
    for m in range(0, order + 1):
        if m > 0:
            q[(m, m)] = q[(m - 1, m - 1)] * (2 * m - 1)
        if m + 1 <= order:
            q[(m + 1, m)] = z * (2 * m + 1) * q[(m, m)]
        for l in range(m + 2, order + 1):
            q[(l, m)] = (
                z * (2 * l - 1) * q[(l - 1, m)] - (l + m - 1) * q[(l - 2, m)]
            ) / (l - m)

    out = []
    sqrt2 = math.sqrt(2.0)
    for l in range(order + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            base = q[(l, am)]
            if m == 0:
                out.append(_k(l, 0) * base)
            elif m > 0:
                out.append(sqrt2 * _k(l, m) * base * cm[am])
            else:
                out.append(sqrt2 * _k(l, am) * base * sm[am])
    return jnp.stack(out, axis=-1)


def eval_function(coeffs: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct sum_lm c_lm Y_lm(d); coeffs [..., C], d [N, 3]."""
    order = int(math.isqrt(coeffs.shape[-1])) - 1
    basis = eval_basis(d, order)
    return basis @ coeffs


@partial(jax.jit, static_argnames=("order",))
def project_dirs(values: jnp.ndarray, d: jnp.ndarray, order: int,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Monte-Carlo SH projection from sampled directions.

    values [N] (function samples), d [N, 3] unit dirs, weights [N] =
    1/(pdf * N) (defaults to uniform-sphere MC: 4pi/N).
    (Reference: shvector.h SHVector::project's MC path.)
    """
    n = d.shape[0]
    if weights is None:
        weights = jnp.full((n,), 4.0 * math.pi / n)
    basis = eval_basis(d, order)  # [N, C]
    return (basis * (values * weights)[:, None]).sum(axis=0)


def project(fn, order: int, res: int = 64) -> jnp.ndarray:
    """Deterministic projection on a theta/phi product quadrature grid
    (midpoint rule — the reference uses Gauss-Legendre; midpoint at res=64
    is ample for the low orders used in rendering)."""
    it = (jnp.arange(res) + 0.5) / res
    theta = it * math.pi
    phi = it * 2.0 * math.pi
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    st = jnp.sin(tt)
    d = jnp.stack(
        [st * jnp.cos(pp), st * jnp.sin(pp), jnp.cos(tt)], axis=-1
    ).reshape(-1, 3)
    vals = fn(d)
    w = (st * (math.pi / res) * (2.0 * math.pi / res)).reshape(-1)
    basis = eval_basis(d, order)
    return (basis * (vals * w)[:, None]).sum(axis=0)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Integral of the product of two SH-expanded functions."""
    return jnp.sum(a * b, axis=-1)


def lambda_l(order: int) -> jnp.ndarray:
    """Per-coefficient convolution eigenvalues sqrt(4pi/(2l+1))
    (Funk-Hecke; reference: shvector.h convolve)."""
    lam = []
    for l in range(order + 1):
        lam += [math.sqrt(4.0 * math.pi / (2 * l + 1))] * (2 * l + 1)
    return jnp.asarray(lam)


def convolve_cosine(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Convolve with the clamped-cosine kernel (irradiance from radiance,
    Ramamoorthi & Hanrahan 2001): scale band l by lambda_l * a_l where
    a_l are the ZH coefficients of max(cos, 0)."""
    order = int(math.isqrt(coeffs.shape[-1])) - 1
    a = []
    for l in range(order + 1):
        if l == 0:
            zl = math.sqrt(math.pi) / 2.0
        elif l == 1:
            zl = math.sqrt(math.pi / 3.0)
        elif l % 2 == 1:
            zl = 0.0
        else:
            h = l // 2
            zl = (
                math.sqrt((2 * l + 1) * math.pi)
                * (-1) ** (h + 1)
                / (2**l * (l - 1) * (l + 2))
                * math.factorial(l)
                / (math.factorial(h) ** 2)
            )
        a += [zl] * (2 * l + 1)
    return coeffs * lambda_l(order) * jnp.asarray(a)


def rotate_z(coeffs: jnp.ndarray, angle) -> jnp.ndarray:
    """Rotate an SH expansion about +z by ``angle`` (exact phase shift;
    reference: shvector.h SHRotation for the general case — arbitrary
    rotations compose this with basis changes or re-projection)."""
    order = int(math.isqrt(coeffs.shape[-1])) - 1
    out = []
    idx = 0
    cos = jnp.cos
    sin = jnp.sin
    parts = []
    for l in range(order + 1):
        for m in range(-l, l + 1):
            parts.append((l, m, idx))
            idx += 1
    out = [None] * len(parts)
    for l, m, i in parts:
        if m == 0:
            out[i] = coeffs[..., i]
        elif m > 0:
            j = i - 2 * m  # index of (l, -m)
            out[i] = coeffs[..., i] * cos(m * angle) - coeffs[..., j] * sin(
                m * angle
            )
        else:
            am = -m
            j = i + 2 * am  # index of (l, +m)
            out[i] = coeffs[..., i] * cos(am * angle) + coeffs[..., j] * sin(
                am * angle
            )
    return jnp.stack(out, axis=-1)
