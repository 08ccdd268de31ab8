import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.core import frame, warp
from sdmm_tpu.core.spectrum import interpolated_spectrum_to_rgb, luminance


def test_coordinate_system_orthonormal():
    key = jax.random.PRNGKey(0)
    n = frame.normalize(jax.random.normal(key, (128, 3)))
    s, t = frame.coordinate_system(n)
    np.testing.assert_allclose(np.asarray(frame.dot(s, t)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(frame.dot(s, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(frame.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(frame.dot(s, s)), 1.0, atol=1e-5)
    # Right-handed: s × t = n
    np.testing.assert_allclose(np.asarray(frame.cross(s, t)), np.asarray(n), atol=1e-5)


def test_local_world_roundtrip():
    key = jax.random.PRNGKey(1)
    n = frame.normalize(jax.random.normal(key, (64, 3)))
    v = frame.normalize(jax.random.normal(jax.random.fold_in(key, 1), (64, 3)))
    s, t = frame.coordinate_system(n)
    local = frame.to_local(s, t, n, v)
    back = frame.to_world(s, t, n, local)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_cosine_hemisphere_mean():
    u = jax.random.uniform(jax.random.PRNGKey(2), (200_000, 2))
    w = warp.square_to_cosine_hemisphere(u)
    # E[cos theta] under cosine-weighted sampling = 2/3.
    assert abs(float(jnp.mean(w[:, 2])) - 2.0 / 3.0) < 5e-3
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(w, axis=-1)), 1.0, atol=1e-5
    )


def test_box_muller_moments():
    u = jax.random.uniform(jax.random.PRNGKey(3), (400_000, 2))
    z = warp.square_to_std_normal(u)
    assert abs(float(jnp.mean(z))) < 5e-3
    assert abs(float(jnp.var(z)) - 1.0) < 1e-2


def test_spectrum_flat_is_whitish():
    rgb = interpolated_spectrum_to_rgb(np.array([360.0, 830.0]), np.array([1.0, 1.0]))
    assert abs(luminance(rgb) - 1.0) < 0.05
    assert np.all(rgb > 0.5) and np.all(rgb < 1.5)


def test_cornell_light_spectrum_is_warm():
    rgb = interpolated_spectrum_to_rgb(
        np.array([400.0, 500.0, 600.0, 700.0]), np.array([0.0, 1600.0, 3180.0, 3680.0])
    )
    assert rgb[0] > rgb[2]  # warm light: more red than blue
    assert luminance(rgb) > 500


def test_sobol_nd_matches_scipy():
    """Full-dim Sobol (core/sampler.sobol_nd) reproduces scipy's Joe-Kuo
    sequence exactly (unscrambled) and keeps net stratification when
    digitally scrambled."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdmm_tpu.core.sampler import sobol_nd

    try:
        from scipy.stats import qmc
    except Exception:
        import pytest

        pytest.skip("no scipy")
    d = 16
    n = 256
    ref = qmc.Sobol(d=d, scramble=False, bits=32).random(n)
    got = np.asarray(sobol_nd(jnp.arange(n), d))
    np.testing.assert_allclose(got, ref, atol=1.0 / (1 << 24) + 1e-7)

    # Scrambled: first 2^k points of each 1-D projection remain
    # stratified (one point per 1/2^k cell).
    s = np.asarray(sobol_nd(jnp.arange(64), d, key=jax.random.PRNGKey(3)))
    for dim in range(d):
        cells = np.floor(s[:, dim] * 64).astype(int)
        assert len(np.unique(cells)) == 64, dim
