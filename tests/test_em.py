"""Stepwise-EM convergence tests (spec: jmm/opt/stepwise_tangent.h)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.core.frame import normalize
from sdmm_tpu.guiding import em as em_mod
from sdmm_tpu.guiding import init as init_mod
from sdmm_tpu.guiding import mixture as mix


def target_density(d):
    """Two antipodal-ish vMF-like lobes on the sphere (unnormalized)."""
    mu1 = np.array([0.0, 0.0, 1.0])
    mu2 = np.array([1.0, 0.0, 0.0])
    return np.exp(8.0 * (d @ mu1 - 1.0)) + 0.5 * np.exp(12.0 * (d @ mu2 - 1.0))


def draw_samples(key, n):
    """Uniform directions weighted by target density (MC radiance samples)."""
    d = np.asarray(normalize(jax.random.normal(key, (n, 3))))
    w = target_density(d)
    pos = np.asarray(jax.random.uniform(jax.random.fold_in(key, 7), (n, 3)))
    return pos, d, w


def test_em_fits_directional_target():
    L, K = 4, 16
    leaf_lo = jnp.zeros((L, 3))
    leaf_hi = jnp.ones((L, 3))
    sdmm = init_mod.init_leaf_params(jax.random.PRNGKey(0), leaf_lo, leaf_hi, K)
    em = em_mod.init_em_state(L, K)
    cfg = em_mod.EMConfig(batch_size=1 << 14)

    active = jnp.array([True] + [False] * (L - 1))
    n = 16384
    lls = []
    for it in range(6):
        pos, d, w = draw_samples(jax.random.PRNGKey(10 + it), n)
        leaf = jnp.zeros(n, dtype=jnp.int32)
        sdmm, em, cnt = em_mod.em_step(
            sdmm, em, jnp.asarray(pos, dtype=jnp.float32), jnp.asarray(d, dtype=jnp.float32),
            jnp.asarray(w, dtype=jnp.float32), leaf, active, cfg
        )
        assert int(cnt[0]) == n
        # Log-likelihood of a held-out batch under leaf 0's conditional.
        prep = mix.prepare(sdmm)
        hp, hd, hw = draw_samples(jax.random.PRNGKey(99), 4096)
        prep_g = jax.tree.map(lambda x: jnp.broadcast_to(x[0], (4096,) + x.shape[1:]), prep)
        cond = mix.create_conditional(
            prep_g, jnp.broadcast_to(sdmm.weight[0], (4096, K)),
            jnp.asarray(hp, dtype=jnp.float32),
        )
        pdf = np.asarray(mix.conditional_pdf(cond, jnp.asarray(hd, dtype=jnp.float32)))
        ll = float(np.sum(hw * np.log(np.maximum(pdf, 1e-12))) / hw.sum())
        lls.append(ll)

    # Weighted log-likelihood must improve substantially over training.
    assert lls[-1] > lls[0] + 0.3, lls
    # Other leaves untouched.
    assert int(em.iterations[1]) == 0
    # Weights stay normalized.
    np.testing.assert_allclose(float(sdmm.weight[0].sum()), 1.0, atol=1e-4)

    # The fitted conditional should put most mass near the dominant lobe.
    prep = mix.prepare(sdmm)
    prep_g = jax.tree.map(lambda x: x[0][None], prep)
    cond = mix.create_conditional(
        prep_g, sdmm.weight[0][None], jnp.array([[0.5, 0.5, 0.5]])
    )
    cond0 = jax.tree.map(lambda x: x[0], cond)
    pdf_top = float(mix.conditional_pdf(cond0, jnp.array([0.0, 0.0, 1.0])))
    pdf_bot = float(mix.conditional_pdf(cond0, jnp.array([0.0, 0.0, -1.0])))
    assert pdf_top > 5.0 * max(pdf_bot, 1e-6), (pdf_top, pdf_bot)


def test_em_inactive_leaves_frozen():
    L, K = 2, 8
    sdmm = init_mod.init_leaf_params(
        jax.random.PRNGKey(1), jnp.zeros((L, 3)), jnp.ones((L, 3)), K
    )
    em = em_mod.init_em_state(L, K)
    pos, d, w = draw_samples(jax.random.PRNGKey(2), 1024)
    leaf = jnp.zeros(1024, dtype=jnp.int32)
    active = jnp.array([True, False])
    new_sdmm, new_em, _ = em_mod.em_step(
        sdmm, em, jnp.asarray(pos, np.float32), jnp.asarray(d, np.float32),
        jnp.asarray(w, np.float32), leaf, active
    )
    np.testing.assert_array_equal(np.asarray(new_sdmm.weight[1]), np.asarray(sdmm.weight[1]))
    np.testing.assert_array_equal(np.asarray(new_sdmm.mean[1]), np.asarray(sdmm.mean[1]))
    assert not np.array_equal(np.asarray(new_sdmm.mean[0]), np.asarray(sdmm.mean[0]))
