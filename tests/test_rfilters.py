"""Reconstruction filters + Sobol sampler tests.

Mirrors the reference's rfilter behavior checks (mitsuba/src/rfilters/*):
each filter footprint deposits total weight 1 per sample, so splatting a
constant radiance field develops back to the constant everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.core.sampler import sobol_2d
from sdmm_tpu.render import film as film_mod
from sdmm_tpu.render.rfilters import FILTER_RADIUS, splat_filtered


@pytest.mark.parametrize("name", ["tent", "gaussian", "mitchell", "catmullrom", "lanczos"])
def test_filter_partition_of_unity(name):
    w, h = 16, 12
    n = w * h * 4
    key = jax.random.PRNGKey(0)
    pix = jax.random.randint(key, (n,), 0, w * h)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    px = (pix % w).astype(jnp.float32) + u[:, 0]
    py = (pix // w).astype(jnp.float32) + u[:, 1]
    vals = jnp.broadcast_to(jnp.array([0.25, 0.5, 1.0]), (n, 3))

    image = jnp.zeros((w * h, 3))
    sqr = jnp.zeros((w * h, 3))
    weight = jnp.zeros((w * h,))
    image, sqr, weight = splat_filtered(
        image, sqr, weight, pix, vals, px, py, w, h, name
    )
    # Total deposited weight = number of samples (renormalized footprints).
    assert abs(float(weight.sum()) - n) < 1e-2 * n
    # A constant field develops back to the constant (away from borders the
    # signed-lobe filters also cancel exactly; borders renormalize).
    dev = np.asarray(image) / np.maximum(np.asarray(weight)[:, None], 1e-6)
    covered = np.asarray(weight) > 0.5
    np.testing.assert_allclose(
        dev[covered], np.array([0.25, 0.5, 1.0]) * np.ones((covered.sum(), 3)),
        rtol=2e-2, atol=2e-2,
    )


def test_filter_radius_table_complete():
    for name in ("box", "tent", "gaussian", "mitchell", "catmullrom", "lanczos"):
        assert name in FILTER_RADIUS


def test_box_splat_unchanged():
    w, h = 8, 8
    n = 64
    pix = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.ones((n, 3))
    image, sqr, weight = film_mod.splat(
        jnp.zeros((w * h, 3)), jnp.zeros((w * h, 3)), jnp.zeros((w * h,)), pix, vals
    )
    np.testing.assert_allclose(np.asarray(weight), 1.0)
    np.testing.assert_allclose(np.asarray(image), 1.0)


def test_sobol_low_discrepancy():
    n = 1024
    idx = jnp.arange(n, dtype=jnp.int32)
    pid = jnp.zeros((n,), dtype=jnp.int32)  # single pixel -> one rotation
    pts = np.asarray(sobol_2d(idx, pid, jax.random.PRNGKey(3)))
    assert pts.shape == (n, 2)
    assert (pts >= 0.0).all() and (pts < 1.0).all()
    # QMC mean converges much faster than MC: |mean - 0.5| = O(log n / n).
    assert abs(pts[:, 0].mean() - 0.5) < 0.02
    assert abs(pts[:, 1].mean() - 0.5) < 0.02
    # Stratification: each of 32 equal bins in dim 0 gets exactly n/32 points
    # (van der Corput; shift-invariant up to +-1 per bin).
    hist, _ = np.histogram(pts[:, 0], bins=32, range=(0, 1))
    assert hist.max() - hist.min() <= 2
    hist1, _ = np.histogram(pts[:, 1], bins=32, range=(0, 1))
    assert hist1.max() - hist1.min() <= 2


def test_sobol_pixels_decorrelated():
    n = 64
    idx = jnp.zeros((n,), dtype=jnp.int32)
    pid = jnp.arange(n, dtype=jnp.int32)
    pts = np.asarray(sobol_2d(idx, pid, jax.random.PRNGKey(4)))
    # Same sample index, different pixels -> distinct rotated points.
    assert len(np.unique(pts[:, 0].round(6))) > n // 2
