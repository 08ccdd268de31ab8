"""Differentiable rendering + inverse rendering (new vs the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.diff.inverse import make_render_fn, optimize_parameter, pixel_gradients

from test_render import make_box_scene


def small_scene():
    b = make_box_scene(12, 12)
    scene, cfg = b.build()
    cfg.max_depth = 3
    cfg.rr_depth = 3
    return scene, cfg


def test_pixel_gradients_exist_and_are_finite():
    scene, cfg = small_scene()
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    g = pixel_gradients(scene, cfg, pix, "bsdf_albedo", jax.random.PRNGKey(0), spp=2)
    g = np.asarray(g)
    assert g.shape == scene.bsdf_albedo.shape
    assert np.isfinite(g).all()
    # Increasing the white wall albedo must increase mean luminance.
    assert g[0].sum() > 0.0  # bsdf 0 = white walls


def test_gradient_matches_finite_difference():
    scene, cfg = small_scene()
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    render = make_render_fn(scene, cfg, pix, "bsdf_albedo", spp=4)

    def mean_lum(albedo):
        return jnp.mean(render(albedo, key))

    g = jax.grad(mean_lum)(scene.bsdf_albedo)
    eps = 3e-2
    e = jnp.zeros_like(scene.bsdf_albedo).at[0, 1].set(eps)
    # Same key → same path decisions: FD of the *estimator* matches its grad.
    fd = (mean_lum(scene.bsdf_albedo + e) - mean_lum(scene.bsdf_albedo - e)) / (2 * eps)
    rel = abs(float(g[0, 1]) - float(fd)) / max(abs(float(fd)), 1e-8)
    assert rel < 0.08, (float(g[0, 1]), float(fd))


def test_inverse_rendering_recovers_albedo():
    scene, cfg = small_scene()
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    render = make_render_fn(scene, cfg, pix, "bsdf_albedo", spp=4)
    target = render(scene.bsdf_albedo, jax.random.PRNGKey(0))

    # Perturb the red wall's albedo and recover it (correlated estimator:
    # same seed as the target → loss has an exact zero at the truth).
    init = scene.bsdf_albedo.at[1].set(jnp.array([0.3, 0.3, 0.3]))
    fitted, losses = optimize_parameter(
        scene, cfg, np.asarray(target).reshape(cfg.height, cfg.width, 3),
        "bsdf_albedo", init, steps=60, lr=5e-2, spp=4, seed=0,
    )
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    true_red = np.asarray(scene.bsdf_albedo[1])
    got = np.asarray(fitted[1])
    assert np.abs(got - true_red).max() < 0.08, (got, true_red)
