"""Distribution tests for the SDMM mixture core.

Replicates the reference's chi-square goodness-of-fit strategy
(reference: mitsuba/src/tests/test_chisquare.cpp, core/chisquare.h:81):
sampled histograms over the sphere are compared against numerically
integrated pdfs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.core.frame import normalize
from sdmm_tpu.guiding import mixture as mix
from sdmm_tpu.guiding import tangent as tg


def make_test_sdmm(key, L=2, K=4, spread=0.3):
    """Random valid mixture over [0,1]^3 x S^2."""
    ks = jax.random.split(key, 4)
    pos = jax.random.uniform(ks[0], (L, K, 3))
    dirs = normalize(jax.random.normal(ks[1], (L, K, 3)))
    mean = jnp.concatenate([pos, dirs], axis=-1)
    # Random SPD covariance: A A^T + eps I, moderate correlation.
    a = jax.random.normal(ks[2], (L, K, 5, 5)) * spread * 0.3
    cov = jnp.einsum("...ij,...kj->...ik", a, a) + jnp.eye(5) * spread**2
    w = jax.random.uniform(ks[3], (L, K)) + 0.1
    w = w / w.sum(-1, keepdims=True)
    return mix.SDMM(weight=w, mean=mean, cov=cov)


def fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.pi * (1 + 5**0.5) * i
    z = 1 - 2 * i / n
    r = np.sqrt(np.maximum(0, 1 - z * z))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def test_prepare_valid():
    m = make_test_sdmm(jax.random.PRNGKey(0))
    prep = mix.prepare(m)
    assert bool(jnp.all(prep.valid))
    # chol · inv_chol = I
    eye = jnp.einsum("...ij,...jk->...ik", prep.chol, prep.inv_chol)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(5), eye.shape), atol=1e-4
    )


def test_conditional_pdf_integrates_to_one():
    m = make_test_sdmm(jax.random.PRNGKey(1), L=1, K=4, spread=0.4)
    prep = mix.prepare(m)
    pos = jnp.array([[0.5, 0.5, 0.5]])
    prep_g = jax.tree.map(lambda x: x[0][None], prep)
    cond = mix.create_conditional(prep_g, m.weight[0][None], pos)
    assert bool(cond.valid[0])
    n = 100_000
    dirs = jnp.asarray(fibonacci_sphere(n), dtype=jnp.float32)
    pdf = mix.conditional_pdf(jax.tree.map(lambda x: x[0], cond), dirs)
    integral = float(jnp.mean(pdf) * 4 * np.pi)
    assert abs(integral - 1.0) < 0.03, integral


def test_conditional_sample_matches_pdf():
    """Chi-square-style: histogram of samples vs integrated pdf over sphere bins."""
    m = make_test_sdmm(jax.random.PRNGKey(2), L=1, K=4, spread=0.5)
    prep = mix.prepare(m)
    pos = jnp.array([[0.4, 0.6, 0.5]])
    prep_g = jax.tree.map(lambda x: x[0][None], prep)
    cond1 = mix.create_conditional(prep_g, m.weight[0][None], pos)
    n = 120_000
    cond = jax.tree.map(lambda x: jnp.broadcast_to(x[0], (n,) + x.shape[1:]), cond1)
    d, ok = mix.conditional_sample(cond, jax.random.PRNGKey(3))
    d = np.asarray(d)[np.asarray(ok)]
    # Bin by z and phi octant.
    zbins = np.clip(((d[:, 2] + 1) * 4).astype(int), 0, 7)
    pbins = np.clip(((np.arctan2(d[:, 1], d[:, 0]) / np.pi + 1) * 4).astype(int), 0, 7)
    hist = np.zeros((8, 8))
    np.add.at(hist, (zbins, pbins), 1.0)
    hist /= len(d)
    # Expected mass via dense integration.
    dd = fibonacci_sphere(200_000)
    pdf = np.asarray(
        mix.conditional_pdf(jax.tree.map(lambda x: x[0], cond1), jnp.asarray(dd, dtype=jnp.float32))
    )
    zb = np.clip(((dd[:, 2] + 1) * 4).astype(int), 0, 7)
    pb = np.clip(((np.arctan2(dd[:, 1], dd[:, 0]) / np.pi + 1) * 4).astype(int), 0, 7)
    exp_hist = np.zeros((8, 8))
    np.add.at(exp_hist, (zb, pb), pdf)
    exp_hist *= 4 * np.pi / len(dd)
    # Compare where expected mass is non-trivial.
    sel = exp_hist > 1e-3
    rel = np.abs(hist[sel] - exp_hist[sel]) / exp_hist[sel]
    assert np.quantile(rel, 0.9) < 0.15, (hist.sum(), exp_hist.sum())


def test_posterior_sums_to_one():
    m = make_test_sdmm(jax.random.PRNGKey(4), L=3, K=8)
    prep = mix.prepare(m)
    n = 64
    key = jax.random.PRNGKey(5)
    pos = jax.random.uniform(key, (n, 3))
    d = normalize(jax.random.normal(jax.random.fold_in(key, 1), (n, 3)))
    leaf = jax.random.randint(jax.random.fold_in(key, 2), (n,), 0, 3)
    w_g = m.weight[leaf]
    mean_g = m.mean[leaf]
    pdf, post, t_abs, hp = mix.posterior_and_log(
        w_g, mean_g, prep.inv_chol[leaf], prep.inv_det_chol[leaf],
        prep.rot[leaf], pos, d,
    )
    s = np.asarray(post.sum(-1))
    valid = np.asarray(pdf.sum(-1)) > 0
    np.testing.assert_allclose(s[valid], 1.0, atol=1e-4)
    # Tangent spatial coords are absolute positions.
    np.testing.assert_allclose(
        np.asarray(t_abs[..., :3]),
        np.broadcast_to(np.asarray(pos)[:, None, :], t_abs[..., :3].shape),
        atol=1e-6,
    )


def test_joint_pdf_integrates_over_direction():
    """∫ joint_pdf dω at fixed pos = marginal N3(pos)."""
    m = make_test_sdmm(jax.random.PRNGKey(6), L=1, K=2, spread=0.4)
    prep = mix.prepare(m)
    pos = jnp.array([0.5, 0.45, 0.55])
    n = 150_000
    dirs = jnp.asarray(fibonacci_sphere(n), dtype=jnp.float32)
    posb = jnp.broadcast_to(pos, (n, 3))
    pdf, _ = mix.component_pdf(
        jnp.broadcast_to(m.mean[0], (n, 2, 6)),
        jnp.broadcast_to(prep.inv_chol[0], (n, 2, 5, 5)),
        jnp.broadcast_to(prep.inv_det_chol[0], (n, 2)),
        jnp.broadcast_to(prep.rot[0], (n, 2, 3, 3)),
        posb, dirs,
    )
    mixture_pdf = jnp.sum(m.weight[0] * pdf, axis=-1)
    integral = float(jnp.mean(mixture_pdf) * 4 * np.pi)
    marg = mix.marginal_pdf(
        prep.mu_a[0], prep.marg_inv_chol[0], prep.marg_inv_det[0], pos
    )
    expected = float(jnp.sum(m.weight[0] * marg))
    assert abs(integral - expected) / expected < 0.05, (integral, expected)


def test_product_proportional_to_pointwise_product():
    """product(a,b).pdf ∝ a.pdf × b.pdf at matched normalization."""
    m1 = make_test_sdmm(jax.random.PRNGKey(7), L=1, K=3, spread=0.3)
    m2 = make_test_sdmm(jax.random.PRNGKey(8), L=1, K=2, spread=0.3)
    p1, p2 = mix.prepare(m1), mix.prepare(m2)
    pos = jnp.array([[0.5, 0.5, 0.5]])
    c1 = mix.create_conditional(jax.tree.map(lambda x: x[0][None], p1), m1.weight[0][None], pos)
    c2 = mix.create_conditional(jax.tree.map(lambda x: x[0][None], p2), m2.weight[0][None], pos)
    prod = mix.product(c1, c2)
    assert bool(prod.valid[0])
    dirs = jnp.asarray(fibonacci_sphere(50_000), dtype=jnp.float32)
    f1 = np.asarray(mix.conditional_pdf(jax.tree.map(lambda x: x[0], c1), dirs))
    f2 = np.asarray(mix.conditional_pdf(jax.tree.map(lambda x: x[0], c2), dirs))
    fp = np.asarray(mix.conditional_pdf(jax.tree.map(lambda x: x[0], prod), dirs))
    # The product mixture must stay normalized.
    integral = fp.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.02, integral
    ref = f1 * f2
    sel = (ref > ref.max() * 1e-2) & (fp > 0)
    ratio = fp[sel] / ref[sel]
    # Tangent-space products are approximate (sphere curvature); the error
    # shrinks with lobe width — the reference shares this approximation
    # (multivariate_tangent_normal.h:571 multiply).
    spread = np.std(np.log(ratio))
    assert spread < 0.3, spread


def test_prune_conditional_top_k():
    """prune_conditional keeps the k heaviest components renormalized; its
    pdf equals the renormalized sub-mixture (reference:
    create_conditional_pruned, roughconductor.cpp:192)."""
    m = make_test_sdmm(jax.random.PRNGKey(12), L=1, K=6, spread=0.3)
    p = mix.prepare(m)
    pos = jnp.array([[0.4, 0.6, 0.5]])
    c = mix.create_conditional(
        jax.tree.map(lambda x: x[0][None], p), m.weight[0][None], pos
    )
    k = 2
    pruned = mix.prune_conditional(c, k)
    assert pruned.weight.shape[-1] == k
    w = np.asarray(c.weight[0])
    top = np.sort(w)[::-1][:k]
    np.testing.assert_allclose(
        np.sort(np.asarray(pruned.weight[0]))[::-1], top / top.sum(),
        rtol=1e-5,
    )
    # pdf of the pruned mixture == renormalized sum over the top-k comps.
    dirs = jnp.asarray(fibonacci_sphere(5000), dtype=jnp.float32)
    fp = np.asarray(
        mix.conditional_pdf(jax.tree.map(lambda x: x[0], pruned), dirs)
    )
    integral = fp.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.03, integral
    # Gathered geometry matches the originals (mean dirs subset).
    mu_full = np.asarray(c.mu_dir[0])
    mu_pruned = np.asarray(pruned.mu_dir[0])
    for row in mu_pruned:
        assert np.min(np.linalg.norm(mu_full - row, axis=-1)) < 1e-6
