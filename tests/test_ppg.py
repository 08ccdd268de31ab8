"""PPG comparison integrator tests (reference: guided_path.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.guiding.ppg import (
    PPGConfig,
    PPGTrainer,
    RES,
    cell_to_dir,
    dir_to_cell,
    histogram_pdf,
    histogram_sample,
)
from sdmm_tpu.core.frame import normalize
from sdmm_tpu.guiding import ppg

from test_render import make_box_scene


def test_cell_mapping_roundtrip():
    key = jax.random.PRNGKey(0)
    d = normalize(jax.random.normal(key, (1024, 3)))
    cell = dir_to_cell(d)
    assert int(cell.min()) >= 0 and int(cell.max()) < RES * RES
    # Center-of-cell direction maps back to the same cell.
    d2 = cell_to_dir(cell, jnp.full((1024, 2), 0.5))
    cell2 = dir_to_cell(d2)
    np.testing.assert_array_equal(np.asarray(cell), np.asarray(cell2))


def test_histogram_pdf_normalized():
    key = jax.random.PRNGKey(1)
    hist = jax.random.uniform(key, (1, RES * RES))
    # Dense integration over the sphere.
    n = 200_000
    i = np.arange(n) + 0.5
    phi = np.pi * (1 + 5**0.5) * i
    z = 1 - 2 * i / n
    r = np.sqrt(np.maximum(0, 1 - z * z))
    dirs = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1), jnp.float32)
    hist_g = jnp.broadcast_to(hist[0], (n, RES * RES))
    pdf = histogram_pdf(hist_g, dirs)
    integral = float(jnp.mean(pdf) * 4 * np.pi)
    assert abs(integral - 1.0) < 0.02, integral


def test_histogram_sample_matches_distribution():
    hist = jnp.zeros((RES * RES,)).at[37].set(3.0).at[100].set(1.0)
    n = 40_000
    hist_g = jnp.broadcast_to(hist, (n, RES * RES))
    d = histogram_sample(hist_g, jax.random.PRNGKey(2))
    cells = np.asarray(dir_to_cell(d))
    frac37 = (cells == 37).mean()
    frac100 = (cells == 100).mean()
    assert abs(frac37 - 0.75) < 0.02, frac37
    assert abs(frac100 - 0.25) < 0.02, frac100


def test_ppg_training_unbiased_and_improves():
    b = make_box_scene(20, 20)
    scene, cfg = b.build()
    cfg.max_depth = 4
    cfg.rr_depth = 4
    tr = PPGTrainer(scene, cfg, PPGConfig(max_leaves=64, split_threshold=2000,
                                          rays_per_wave=400))
    img, iters = tr.run(total_spp=31)  # 1+2+4+8+16
    assert np.isfinite(img).all()
    assert int(jnp.sum(tr.initialized)) > 0
    from sdmm_tpu.render.renderer import render

    ref = render(scene, cfg, spp=256, seed=11, rays_per_wave=400, nee=True)
    rel = abs(img.mean() - np.asarray(ref["image"]).mean()) / np.asarray(
        ref["image"]).mean()
    assert rel < 0.15, rel

    def mean_var(it):
        nw = np.maximum(it["weight"], 1.0)[:, None]
        mean = it["image"] / nw
        return (np.maximum(it["sqr"] / nw - mean * mean, 0)
                / np.maximum(nw - 1, 1)).mean()

    # Per-sample variance in the last (guided) iteration well below the
    # first with a variance estimate (iters[0] is 1 spp → no estimate).
    assert mean_var(iters[-1]) < mean_var(iters[1]) * 0.5, (
        mean_var(iters[1]), mean_var(iters[-1]))


def test_quadtree_pdf_rho0_equals_flat_histogram():
    """rho=0 subdivides everything -> identical to the finest histogram."""
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.gamma(0.3, size=(64, ppg.RES * ppg.RES))
                    .astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    p_flat = np.asarray(ppg.histogram_pdf(h, d))
    p_qt = np.asarray(ppg.quadtree_pdf(h, d, rho=0.0))
    np.testing.assert_allclose(p_qt, p_flat, rtol=2e-4)


def test_quadtree_sample_matches_pdf():
    """Chi-square: hierarchical descent sampling vs the adaptive pdf."""
    from sdmm_tpu.utils.chisquare import chi2_test

    rng = np.random.default_rng(1)
    # Skewed histogram: a bright 2x2 block plus faint background, so the
    # adaptive tree actually prunes (background collapses to coarse nodes).
    row = rng.gamma(0.05, size=(ppg.RES, ppg.RES)).astype(np.float32) * 0.01
    row[4:6, 8:10] += 5.0
    n = 200_000
    h = jnp.broadcast_to(jnp.asarray(row.reshape(-1)),
                         (n, ppg.RES * ppg.RES))
    d = ppg.quadtree_sample(h, jax.random.PRNGKey(2), rho=0.01)

    h1 = jnp.asarray(row.reshape(1, -1))

    def pdf_fn(dd):
        dd = jnp.asarray(dd, dtype=jnp.float32)
        hh = jnp.broadcast_to(h1, (dd.shape[0], ppg.RES * ppg.RES))
        return np.asarray(ppg.quadtree_pdf(hh, dd, rho=0.01))

    passed, p, st = chi2_test(np.asarray(d), pdf_fn)
    assert passed, (p, st)


def test_quadtree_prunes_coarse_regions():
    """Low-flux regions report the coarse node's pooled pdf, not the
    noisy finest-cell value."""
    row = np.full((ppg.RES, ppg.RES), 1e-4, np.float32)
    row[0, 0] = 100.0
    h = jnp.asarray(row.reshape(1, -1))
    # A direction deep in the dim region: its quadrant (flux ~64e-4 <<
    # 1% of total) freezes at a coarse level -> pooled pdf.
    d_dim = jnp.asarray([[0.0, 0.0, 0.99]])  # ct~1 -> y=RES-1 quadrant
    p_qt = float(ppg.quadtree_pdf(h, d_dim, rho=0.01)[0])
    p_flat = float(ppg.histogram_pdf(h, d_dim)[0])
    assert p_qt > 0
    # Same order as flat (uniform region), but computed from the pooled
    # parent: identical here because the region is uniform.
    np.testing.assert_allclose(p_qt, p_flat, rtol=1e-3)
