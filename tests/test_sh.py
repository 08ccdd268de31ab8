"""Spherical-harmonics tests (core/sh.py).

Mirrors the reference's SH test plugin (reference: mitsuba/src/tests/
test_sh.cpp): orthonormality of the basis under quadrature, projection /
reconstruction round-trips, Parseval dot products, z-rotation, and the
cosine convolution identity.
"""

import math

import jax.numpy as jnp
import numpy as np

from sdmm_tpu.core import sh


def _grid(res=96):
    it = (np.arange(res) + 0.5) / res
    theta = it * math.pi
    phi = it * 2.0 * math.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    st = np.sin(tt)
    d = np.stack([st * np.cos(pp), st * np.sin(pp), np.cos(tt)], -1).reshape(-1, 3)
    w = (st * (math.pi / res) * (2 * math.pi / res)).reshape(-1)
    return jnp.asarray(d), jnp.asarray(w)


def test_orthonormal_basis():
    d, w = _grid()
    order = 4
    b = np.asarray(sh.eval_basis(d, order))  # [N, C]
    gram = (b * w[:, None].__array__()).T @ b
    np.testing.assert_allclose(gram, np.eye(sh.n_coeffs(order)), atol=2e-3)


def test_project_reconstruct_roundtrip():
    # A band-limited function reconstructs exactly.
    rng = np.random.default_rng(0)
    order = 3
    c_true = jnp.asarray(rng.normal(size=sh.n_coeffs(order)).astype(np.float32))

    def fn(d):
        return sh.eval_function(c_true, d)

    c = sh.project(fn, order, res=96)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_true), atol=2e-3)


def test_mc_projection_converges():
    rng = np.random.default_rng(1)
    n = 200_000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * math.pi, n)
    r = np.sqrt(np.maximum(1 - z * z, 0))
    d = jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    )
    vals = jnp.maximum(d[:, 2], 0.0)  # clamped cosine
    c = sh.project_dirs(vals, d, order=2)
    # Analytic ZH of max(cos,0): c00 = sqrt(pi)/2, c10 = sqrt(pi/3).
    assert abs(float(c[0]) - math.sqrt(math.pi) / 2) < 0.02
    assert abs(float(c[2]) - math.sqrt(math.pi / 3)) < 0.02


def test_dot_is_integral_of_product():
    d, w = _grid()
    rng = np.random.default_rng(2)
    order = 2
    a = jnp.asarray(rng.normal(size=sh.n_coeffs(order)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=sh.n_coeffs(order)).astype(np.float32))
    fa = np.asarray(sh.eval_function(a, d))
    fb = np.asarray(sh.eval_function(b, d))
    integral = float((fa * fb * np.asarray(w)).sum())
    assert abs(integral - float(sh.dot(a, b))) < 5e-3


def test_rotate_z():
    rng = np.random.default_rng(3)
    order = 3
    c = jnp.asarray(rng.normal(size=sh.n_coeffs(order)).astype(np.float32))
    ang = 0.7
    cr = sh.rotate_z(c, ang)
    d, _ = _grid(48)
    # Evaluating the rotated expansion at d equals evaluating the original
    # at R_z(-ang) d.
    ca, sa = math.cos(-ang), math.sin(-ang)
    d_rot = jnp.stack(
        [ca * d[:, 0] - sa * d[:, 1], sa * d[:, 0] + ca * d[:, 1], d[:, 2]],
        axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(sh.eval_function(cr, d)),
        np.asarray(sh.eval_function(c, d_rot)),
        atol=1e-4,
    )


def test_cosine_convolution_gives_irradiance():
    # Radiance = constant 1 over the sphere -> irradiance = pi everywhere.
    def fn(d):
        return jnp.ones(d.shape[0])

    c = sh.project(fn, order=2, res=64)
    e = sh.convolve_cosine(c)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    irr = np.asarray(sh.eval_function(e, d))
    np.testing.assert_allclose(irr, math.pi, rtol=2e-3)
