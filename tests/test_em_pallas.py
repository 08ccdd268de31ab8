"""EM sufficient-statistics Pallas kernel (ops/em_pallas) vs the XLA
e_step (guiding/em.py). Same math, different execution strategy; the only
numerical divergence is the kernel's polynomial arccos (|err| < 1e-7 rad),
so the stats must agree to tight tolerances. Runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.guiding import em as em_mod
from sdmm_tpu.guiding import init as init_mod
from sdmm_tpu.guiding import mixture as mix
from sdmm_tpu.ops import em_pallas as ep


def _make_problem(key, n_leaves=5, n_samples=5000):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    lo = jnp.zeros((n_leaves, 3))
    hi = jnp.ones((n_leaves, 3))
    sdmm = init_mod.init_leaf_params(k1, lo, hi, ep.K)
    prep = mix.prepare(sdmm)
    pos = jax.random.uniform(k2, (n_samples, 3))
    d = jax.random.normal(k3, (n_samples, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    weight = jax.random.uniform(k4, (n_samples,)) * 2.0
    # Mix in zero-weight, invalid (negative / nan) samples.
    weight = weight.at[::97].set(0.0)
    weight = weight.at[1::211].set(-1.0)
    weight = weight.at[2::503].set(jnp.nan)
    leaf = jax.random.randint(k5, (n_samples,), 0, n_leaves)
    return sdmm, prep, pos, d, weight, leaf


def test_suffstats_match_xla_e_step():
    sdmm, prep, pos, d, weight, leaf = _make_problem(jax.random.PRNGKey(0))
    L = sdmm.weight.shape[0]

    sw0, sm0, sc0, ws0, cnt0 = em_mod.e_step(
        sdmm, prep, pos, d, weight, leaf, L, batch_size=1 << 12
    )
    sw1, sm1, sc1, ws1, cnt1 = ep.e_step_pallas(
        sdmm, prep, pos, d, weight, leaf, L, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))
    np.testing.assert_allclose(np.asarray(ws0), np.asarray(ws1), rtol=1e-6)
    scale = float(jnp.max(jnp.abs(sw0))) + 1e-12
    np.testing.assert_allclose(np.asarray(sw1), np.asarray(sw0),
                               rtol=2e-4, atol=2e-5 * scale)
    # Signed tangent columns cancel heavily across thousands of samples, so
    # fp-reordering noise is judged against the stat magnitude, not zero.
    sm_scale = float(jnp.max(jnp.abs(sm0))) + 1e-12
    np.testing.assert_allclose(np.asarray(sm1), np.asarray(sm0),
                               rtol=2e-4, atol=4e-4 * sm_scale)
    sc_scale = float(jnp.max(jnp.abs(sc0))) + 1e-12
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc0),
                               rtol=3e-4, atol=4e-4 * sc_scale)


def test_suffstats_empty_and_single_leaf():
    """Leaves with no samples yield zero stats; all-one-leaf concentrates."""
    sdmm, prep, pos, d, weight, leaf = _make_problem(
        jax.random.PRNGKey(1), n_leaves=4, n_samples=1500
    )
    leaf = jnp.full_like(leaf, 2)  # everything in leaf 2
    sw, sm, sc, ws, cnt = ep.e_step_pallas(
        sdmm, prep, pos, d, weight, leaf, 4, interpret=True
    )
    assert int(cnt[0]) == 0 and int(cnt[1]) == 0 and int(cnt[3]) == 0
    assert int(cnt[2]) > 0
    np.testing.assert_array_equal(np.asarray(sw[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(sw[3]), 0.0)
    assert float(jnp.sum(sw[2])) > 0.0
    # Covariance stats rows are symmetric by construction.
    np.testing.assert_array_equal(
        np.asarray(sc[2]), np.asarray(jnp.swapaxes(sc[2], -1, -2))
    )


def test_acos_poly_accuracy():
    x = jnp.linspace(-1.0, 1.0, 100001)
    err = jnp.abs(ep._acos_poly(x) - jnp.arccos(x))
    assert float(jnp.max(err)) < 1e-6  # fp32 evaluation noise dominates
