"""Envmap NEE importance sampling tests.

Validates the luminance-CDF sampler against its pdf (the reference's
chi-square pattern for emitters, mitsuba/src/tests/test_chisquare.cpp) and
the MIS-combined estimator end-to-end: an envmap-lit scene must agree
between NEE-on and NEE-off renders within MC noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.scene import emitters
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder
from sdmm_tpu.scene.shapes import make_rectangle as rectangle


def _env_scene(he=16, we=32, seed=0):
    rng = np.random.default_rng(seed)
    env = rng.uniform(0.05, 1.0, (he, we, 3)).astype(np.float32)
    env[he // 4, we // 3] = 25.0  # a bright "sun" texel
    b = SceneBuilder()
    m = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.6, 0.5, 0.4])
    b.add_shape(rectangle(np.diag([1.0, 1.0, 1.0, 1.0])), m)
    b.env_map = env
    b.env_radiance = np.ones(3)
    look = np.eye(4)
    look[:3, 3] = [0.0, 0.0, 4.0]
    look[:3, :3] = np.diag([1.0, 1.0, -1.0]) @ np.eye(3)
    b.set_sensor(look, 40.0, 32, 32)
    return b, env


def test_env_pdf_normalized():
    b, _ = _env_scene()
    scene, _ = b.build()
    # MC estimate of the pdf's integral over the sphere.
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (200_000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    integral = 4.0 * np.pi * float(jnp.mean(emitters.pdf_env_dir(scene, d)))
    assert abs(integral - 1.0) < 0.02


def test_env_sample_pdf_consistent():
    b, env = _env_scene()
    scene, _ = b.build()
    he, we = env.shape[:2]
    # Reference integral of radiance over the sphere from the map itself.
    sin_t = np.sin((np.arange(he) + 0.5) * np.pi / he)
    d_omega = (np.pi / he) * (2.0 * np.pi / we)
    ref = (env * sin_t[:, None, None] * d_omega).sum(axis=(0, 1))
    # MC estimate with the importance sampler.
    u2 = jax.random.uniform(jax.random.PRNGKey(2), (200_000, 2))
    d, rad, pdf = emitters.sample_env(scene, u2)
    est = np.asarray(jnp.mean(rad / pdf[:, None], axis=0))
    np.testing.assert_allclose(est, ref, rtol=0.05)
    # Sampled directions are unit and pdf matches the lookup pdf.
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(emitters.pdf_env_dir(scene, d)), np.asarray(pdf), rtol=1e-4
    )


def test_env_nee_matches_brute_force():
    from sdmm_tpu.render.renderer import render

    b, _ = _env_scene()
    scene, cfg = b.build()
    cfg.max_depth = 3
    res_nee = render(scene, cfg, spp=64, seed=3, nee=True)
    res_brute = render(scene, cfg, spp=256, seed=7, nee=False)
    m_nee = float(np.asarray(res_nee["image"]).mean())
    m_brt = float(np.asarray(res_brute["image"]).mean())
    assert abs(m_nee - m_brt) / m_brt < 0.05, (m_nee, m_brt)


def test_env_select_prob_zero_without_map():
    b = SceneBuilder()
    m = b.add_bsdf(BSDF_DIFFUSE)
    b.add_shape(rectangle(np.eye(4)), m)
    scene, _ = b.build()
    assert float(scene.env_select_prob) == 0.0
    assert scene.env_pdf.shape == (1, 1)


def test_sunsky_envmap_properties():
    """Preetham sky (reference: src/emitters/{sun,sky,sunsky}.cpp):
    brighter near the sun, darkest far away, black below the horizon,
    sun disk dominates when enabled."""
    from sdmm_tpu.scene.sunsky import make_sunsky_envmap

    sun = np.array([0.3, 0.8, 0.2])
    sky = make_sunsky_envmap(sun, turbidity=3.0, resolution=64, with_sun=False)
    assert sky.shape == (64, 128, 3)
    assert np.isfinite(sky).all() and (sky >= 0).all()
    # Below the horizon (theta > pi/2 -> rows >= 32) is black.
    assert sky[34:].max() == 0.0
    # Circumsolar brightening: the texel nearest the sun outshines the
    # darkest above-horizon texel by a wide margin.
    he, we = 64, 128
    sun_n = sun / np.linalg.norm(sun)
    v = np.arccos(sun_n[1]) / np.pi
    u = 0.5 + np.arctan2(sun_n[0], -sun_n[2]) / (2 * np.pi)
    lum = sky[: he // 2 - 2].mean(axis=-1)
    near = sky[int(v * he), int(u * we)].mean()
    assert near > 3.0 * lum[lum > 0].min()

    both = make_sunsky_envmap(sun, turbidity=3.0, resolution=64, with_sun=True)
    assert both.max() > 50.0 * sky.max()  # sun disk dominates


def test_sunsky_render_smoke():
    from sdmm_tpu.render.renderer import render
    from sdmm_tpu.scene.sunsky import make_sunsky_envmap

    b = SceneBuilder()
    m = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.5, 0.5, 0.5])
    b.add_shape(rectangle(np.diag([1.0, 1.0, 1.0, 1.0])), m)
    b.env_map = make_sunsky_envmap([0.4, 1.0, 0.2], resolution=32)
    b.env_radiance = np.ones(3)
    look = np.eye(4)
    look[:3, 3] = [0.0, 1.0, 4.0]
    look[2, 2] = -1.0
    b.set_sensor(look, 40.0, 16, 16)
    scene, cfg = b.build()
    assert float(scene.env_select_prob) > 0.0  # NEE CDF built from the sky
    cfg.max_depth = 3
    res = render(scene, cfg, spp=16, seed=1)
    img = np.asarray(res["image"])
    assert np.isfinite(img).all() and img.mean() > 0.0
