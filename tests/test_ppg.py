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
    grid_pdf,
    grid_sample,
    project_adaptive,
)
from sdmm_tpu.core.frame import normalize
from sdmm_tpu.guiding import ppg

from test_render import make_box_scene


def _per_ray(eff, leaf, d):
    """Gather the pdf row for directions d under projected table eff."""
    eff2d = eff.reshape(-1, RES)
    ct, _ = ppg.dir_to_uv(d)
    y = jnp.clip((ct * RES).astype(jnp.int32), 0, RES - 1)
    return eff2d[leaf * RES + y]


def test_cell_mapping_roundtrip():
    key = jax.random.PRNGKey(0)
    d = normalize(jax.random.normal(key, (1024, 3)))
    cell = dir_to_cell(d)
    assert int(cell.min()) >= 0 and int(cell.max()) < RES * RES
    # Center-of-cell direction maps back to the same cell.
    d2 = cell_to_dir(cell, jnp.full((1024, 2), 0.5))
    cell2 = dir_to_cell(d2)
    np.testing.assert_array_equal(np.asarray(cell), np.asarray(cell2))


def test_projected_pdf_normalized():
    """The adaptive-projected pdf integrates to 1 over the sphere."""
    key = jax.random.PRNGKey(1)
    hist = jax.random.uniform(key, (1, RES * RES))
    eff, eff_row, total = project_adaptive(hist, rho=0.01)
    n = 200_000
    i = np.arange(n) + 0.5
    phi = np.pi * (1 + 5**0.5) * i
    z = 1 - 2 * i / n
    r = np.sqrt(np.maximum(0, 1 - z * z))
    dirs = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1),
                       jnp.float32)
    leaf = jnp.zeros((n,), jnp.int32)
    rows = _per_ray(eff, leaf, dirs)
    pdf = grid_pdf(rows, total[leaf], dirs)
    integral = float(jnp.mean(pdf) * 4 * np.pi)
    assert abs(integral - 1.0) < 0.02, integral


def test_projection_rho0_is_identity():
    """rho=0 subdivides everything -> projected table == raw histogram."""
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.gamma(0.3, size=(8, RES * RES)).astype(np.float32))
    eff, eff_row, total = project_adaptive(h, rho=0.0)
    np.testing.assert_allclose(np.asarray(eff), np.asarray(h), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(total), np.asarray(h.sum(-1)),
                               rtol=2e-4)


def test_projection_pools_dim_regions():
    """Low-flux regions inherit their stopped ancestor's pooled average
    (the reference's unrefined-node uniform pdf)."""
    row = np.full((RES, RES), 1e-4, np.float32)
    row[0, 0] = 100.0
    h = jnp.asarray(row.reshape(1, -1))
    eff, _, total = project_adaptive(h, rho=0.01)
    e = np.asarray(eff).reshape(RES, RES)
    # The dim quadrant far from the bright cell is uniform — pooling
    # preserves its (uniform) value.
    np.testing.assert_allclose(e[RES // 2:, RES // 2:], 1e-4, rtol=1e-3)
    # Total flux is conserved by the projection.
    np.testing.assert_allclose(float(e.sum()), float(np.asarray(h).sum()),
                               rtol=1e-4)
    # The bright cell keeps (at least) its subdivided own mass.
    assert e[0, 0] > 50.0


def test_grid_sample_matches_distribution():
    hist = jnp.zeros((1, RES * RES)).at[0, 37].set(3.0).at[0, 100].set(1.0)
    eff, eff_row, total = project_adaptive(hist, rho=0.0)
    n = 40_000
    leaf = jnp.zeros((n,), jnp.int32)
    d = grid_sample(eff.reshape(-1, RES), eff_row[leaf],
                    leaf, jax.random.PRNGKey(2))
    cells = np.asarray(dir_to_cell(d))
    frac37 = (cells == 37).mean()
    frac100 = (cells == 100).mean()
    assert abs(frac37 - 0.75) < 0.02, frac37
    assert abs(frac100 - 0.25) < 0.02, frac100


def test_grid_sample_matches_adaptive_pdf():
    """Chi-square: two-stage CDF sampling vs the adaptive projected pdf."""
    from sdmm_tpu.utils.chisquare import chi2_test

    rng = np.random.default_rng(1)
    # Skewed histogram: a bright 2x2 block plus faint background, so the
    # adaptive projection actually pools (background collapses coarse).
    row = rng.gamma(0.05, size=(RES, RES)).astype(np.float32) * 0.01
    row[4:6, 8:10] += 5.0
    h = jnp.asarray(row.reshape(1, -1))
    eff, eff_row, total = project_adaptive(h, rho=0.01)
    n = 200_000
    leaf = jnp.zeros((n,), jnp.int32)
    d = grid_sample(eff.reshape(-1, RES), eff_row[leaf], leaf,
                    jax.random.PRNGKey(2))

    def pdf_fn(dd):
        dd = jnp.asarray(dd, dtype=jnp.float32)
        lf = jnp.zeros((dd.shape[0],), jnp.int32)
        rows = _per_ray(eff, lf, dd)
        return np.asarray(grid_pdf(rows, total[lf], dd))

    passed, p, st = chi2_test(np.asarray(d), pdf_fn)
    assert passed, (p, st)


def test_adam_fraction_moves_toward_better_strategy():
    """When the guide pdf explains the product much better than the BSDF
    pdf, the learned fraction should decrease (prefer guide sampling)."""
    L = 4
    theta = jnp.zeros((L,))
    m1 = jnp.zeros((L,))
    m2 = jnp.zeros((L,))
    t = jnp.zeros((L,), jnp.int32)
    n = 4096
    leaf = jnp.zeros((n,), jnp.int32)
    # bsdfPdf low where product is high; guide pdf matches product.
    product = jnp.full((n,), 2.0)
    g_pdf = jnp.full((n,), 2.0)
    bsdf_pdf = jnp.full((n,), 0.05)
    wo_pdf = 0.5 * bsdf_pdf + 0.5 * g_pdf
    gw = jnp.stack([product, wo_pdf, bsdf_pdf, g_pdf], -1)
    for _ in range(4):
        theta, m1, m2, t = ppg.adam_fraction_steps(
            theta, m1, m2, t, gw, jnp.ones((n,)), leaf,
            jnp.ones((n,), bool))
    frac = float(jax.nn.sigmoid(theta[0]))
    assert frac < 0.4, frac  # moved off the 0.5 init toward guide
    # Untouched leaves keep the neutral fraction.
    assert float(jax.nn.sigmoid(theta[3])) == 0.5


def test_ppg_training_unbiased_and_improves():
    b = make_box_scene(20, 20)
    scene, cfg = b.build()
    cfg.max_depth = 4
    cfg.rr_depth = 4
    tr = PPGTrainer(scene, cfg, PPGConfig(max_leaves=64,
                                          stree_threshold=2000,
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


def test_ppg_learned_fraction_runs():
    """End-to-end with the SGD-learned bsdfSamplingFraction (kl loss)."""
    b = make_box_scene(16, 16)
    scene, cfg = b.build()
    cfg.max_depth = 3
    cfg.rr_depth = 3
    tr = PPGTrainer(scene, cfg, PPGConfig(
        max_leaves=32, stree_threshold=2000, rays_per_wave=256,
        bsdf_fraction_loss="kl"))
    img, iters = tr.run(total_spp=15)
    assert np.isfinite(img).all()
    # Some leaf's fraction moved off the sigmoid(0)=0.5 init.
    frac = np.asarray(jax.nn.sigmoid(tr.theta))
    assert (np.abs(frac - 0.5) > 1e-4).any()
    from sdmm_tpu.render.renderer import render

    ref = render(scene, cfg, spp=256, seed=21, rays_per_wave=256, nee=True)
    rel = abs(img.mean() - np.asarray(ref["image"]).mean()) / np.asarray(
        ref["image"]).mean()
    assert rel < 0.2, rel
