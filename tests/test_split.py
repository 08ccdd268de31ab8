"""SVD component-split tests (guiding/split.py).

Spec: jmm/opt/stepwise_tangent.h splitSVD — the split must preserve the
mixture's first two moments exactly (children at +-u*a with weight w/2
and covariance cov - u^2 a a^T reproduce mean and covariance of the
parent), only fire into dead slots, and leave ineligible leaves alone.
"""

import jax.numpy as jnp
import numpy as np

from sdmm_tpu.guiding import mixture as mix
from sdmm_tpu.guiding import split as sp
from sdmm_tpu.guiding import tangent as tg
from sdmm_tpu.guiding.em import init_em_state


def _make_mixture(dead_slots=(2, 3)):
    L, K = 3, 4
    rng = np.random.default_rng(0)
    w = np.full((L, K), 1.0 / K, np.float32)
    mean = np.zeros((L, K, 6), np.float32)
    mean[..., :3] = rng.uniform(0, 1, (L, K, 3))
    d = rng.normal(size=(L, K, 3))
    mean[..., 3:] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    # Anisotropic covariance: strong directional variance on one axis.
    base = np.eye(5, dtype=np.float32) * 0.01
    base[3, 3] = 0.5
    cov = np.broadcast_to(base, (L, K, 5, 5)).copy()
    for k in dead_slots:
        w[:, k] = 0.0
    w /= w.sum(-1, keepdims=True)
    return mix.SDMM(jnp.asarray(w), jnp.asarray(mean), jnp.asarray(cov))


def test_split_fires_into_dead_slot_and_preserves_mass():
    sdmm = _make_mixture()
    em = init_em_state(3, 4)
    em = em._replace(stats_w=em.stats_w.at[:, 0].set(8.0))
    active = jnp.ones(3, bool)
    out, em2, did = sp.svd_split(sdmm, em, active)
    assert bool(did.all())
    np.testing.assert_allclose(
        np.asarray(out.weight).sum(-1), 1.0, rtol=1e-6
    )
    w = np.asarray(out.weight)
    # One previously dead slot now carries half the parent's weight.
    assert (w > 0).sum(-1).min() == 3
    # Stats mass preserved.
    np.testing.assert_allclose(
        np.asarray(em2.stats_w).sum(-1), 8.0, rtol=1e-6
    )


def test_split_preserves_first_two_moments():
    sdmm = _make_mixture()
    em = init_em_state(3, 4)
    out, _, did = sp.svd_split(sdmm, em, jnp.ones(3, bool))
    assert bool(did.all())
    # Identify the split pair: the parent slot j and the filled dead slot.
    w0 = np.asarray(sdmm.weight)
    w1 = np.asarray(out.weight)
    lf = 0
    j = int(np.argmax((w1[lf] < w0[lf]) & (w1[lf] > 0)))
    k = int(np.argmax((w0[lf] == 0) & (w1[lf] > 0)))
    parent_cov = np.asarray(sdmm.cov[lf, j])
    parent_dir = np.asarray(sdmm.mean[lf, j, 3:])

    # Children tangent means in the PARENT frame.
    rot = np.asarray(tg.make_rotation(sdmm.mean[lf, j, 3:6]))
    for child, sign in ((j, -1.0), (k, +1.0)):
        d = np.asarray(out.mean[lf, child, 3:])
        rel = rot.T @ d
        # log map: tangent = rel_xy / sinc(theta)
        theta = np.arccos(np.clip(rel[2], -1, 1))
        sinc = np.sinc(theta / np.pi)
        tvec = rel[:2] / max(sinc, 1e-12)
        # Expected offset: sign * u * a_dir.
        cov_child = np.asarray(out.cov[lf, child])
        a_sq = (parent_cov - cov_child) / (sp.SPLIT_U**2)
        # a a^T rank-1: recover |a_dir| from the diagonal.
        a_dir = np.sqrt(np.maximum(np.diag(a_sq)[3:], 0))
        np.testing.assert_allclose(
            np.abs(tvec), sp.SPLIT_U * a_dir, atol=1e-4
        )
    # Mixture tangent covariance: w/2 [(C + (ua)(ua)^T) * 2] == parent cov.
    cov_child = np.asarray(out.cov[lf, j])
    # Recover a a^T exactly.
    aat = (parent_cov - cov_child) / (sp.SPLIT_U**2)
    mix_cov = cov_child + (sp.SPLIT_U**2) * aat
    np.testing.assert_allclose(mix_cov, parent_cov, atol=1e-6)
    # Children symmetric about the parent direction.
    da = np.asarray(out.mean[lf, j, 3:])
    db = np.asarray(out.mean[lf, k, 3:])
    np.testing.assert_allclose(
        np.dot(da, parent_dir), np.dot(db, parent_dir), atol=1e-5
    )


def test_no_dead_slot_no_split():
    sdmm = _make_mixture(dead_slots=())
    em = init_em_state(3, 4)
    out, _, did = sp.svd_split(sdmm, em, jnp.ones(3, bool))
    assert not bool(did.any())
    np.testing.assert_array_equal(np.asarray(out.weight), np.asarray(sdmm.weight))


def test_low_score_no_split():
    sdmm = _make_mixture()
    # Nearly isotropic tiny covariance -> low directional score.
    cov = jnp.broadcast_to(jnp.eye(5) * 1e-6, sdmm.cov.shape)
    sdmm = sdmm._replace(cov=cov)
    em = init_em_state(3, 4)
    _, _, did = sp.svd_split(sdmm, em, jnp.ones(3, bool))
    assert not bool(did.any())
