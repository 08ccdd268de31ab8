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


def rough_scene():
    """Box with a rough-conductor slab (GGX alpha is a scene parameter)."""
    from sdmm_tpu.scene import shapes as shp
    from sdmm_tpu.scene.scene import BSDF_ROUGHCONDUCTOR

    b = make_box_scene(12, 12)
    m = b.add_bsdf(BSDF_ROUGHCONDUCTOR, specular=[0.9, 0.9, 0.9],
                   eta=0.2, k=[3.0, 3.0, 3.0], alpha=0.3)
    t = np.eye(4)
    t[:3, 3] = [0.0, 0.45, -0.5]
    t[0, 0] = t[1, 1] = 0.5
    b.add_shape(shp.make_rectangle(t), m)
    scene, cfg = b.build()
    cfg.max_depth = 3
    cfg.rr_depth = 3
    return scene, cfg


def test_roughness_gradient_matches_finite_difference():
    """GGX/VNDF reparameterized alpha gradient vs finite differences
    (BASELINE.md target; the VNDF warp is a differentiable function of
    alpha, so the same-key FD of the estimator must match its grad)."""
    scene, cfg = rough_scene()
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    render = make_render_fn(scene, cfg, pix, "bsdf_alpha", spp=4)

    def mean_lum(alpha):
        return jnp.mean(render(alpha, key))

    g = jax.grad(mean_lum)(scene.bsdf_alpha)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    rough_id = int(np.asarray(scene.bsdf_alpha).shape[0]) - 1
    # eps small enough that the FD doesn't straddle a lobe-mask
    # discontinuity (at 2e-2 it picks up a boundary jump the interior
    # AD estimator correctly excludes; at 5e-3 FD and AD agree to 4
    # significant digits).
    eps = 5e-3
    e = jnp.zeros_like(scene.bsdf_alpha).at[rough_id].set(eps)
    fd = (mean_lum(scene.bsdf_alpha + e)
          - mean_lum(scene.bsdf_alpha - e)) / (2 * eps)
    rel = abs(float(g[rough_id]) - float(fd)) / max(abs(float(fd)), 1e-8)
    assert rel < 0.05, (float(g[rough_id]), float(fd))


def test_joint_albedo_roughness_recovery():
    """Joint albedo + GGX roughness inverse rendering (BASELINE.md)."""
    from sdmm_tpu.diff.inverse import (
        make_render_fn_multi, optimize_parameters,
    )

    scene, cfg = rough_scene()
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    names = ("bsdf_albedo", "bsdf_alpha")
    render = make_render_fn_multi(scene, cfg, pix, spp=4)
    truth = {n: getattr(scene, n) for n in names}
    target = render(truth, jax.random.PRNGKey(0))

    rough_id = int(np.asarray(scene.bsdf_alpha).shape[0]) - 1
    init = {
        "bsdf_albedo": scene.bsdf_albedo.at[1].set(
            jnp.array([0.3, 0.3, 0.3])),
        "bsdf_alpha": scene.bsdf_alpha.at[rough_id].set(0.6),
    }
    fitted, losses = optimize_parameters(
        scene, cfg, np.asarray(target).reshape(cfg.height, cfg.width, 3),
        names, init, steps=80, lr=4e-2, spp=4, seed=0,
    )
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])
    got_a = np.asarray(fitted["bsdf_albedo"][1])
    assert np.abs(got_a - np.asarray(scene.bsdf_albedo[1])).max() < 0.1
    got_r = float(fitted["bsdf_alpha"][rough_id])
    assert abs(got_r - 0.3) < 0.08, got_r


def test_multi_device_gradient_parity():
    """Gradients under GSPMD over the 8-device mesh equal the
    single-device gradients (same keys, same estimator)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from sdmm_tpu.diff.inverse import make_render_fn_multi
    from sdmm_tpu.parallel.mesh import make_mesh

    scene, cfg = rough_scene()
    n = cfg.width * cfg.height  # 144 = 8 * 18
    pix = jnp.arange(n, dtype=jnp.int32)
    names = ("bsdf_albedo", "bsdf_alpha")
    truth = {n_: getattr(scene, n_) for n_ in names}
    key = jax.random.PRNGKey(11)

    def grads(render):
        def loss(p):
            return jnp.mean(render(p, key))
        return jax.grad(loss)(truth)

    g_single = grads(make_render_fn_multi(scene, cfg, pix, spp=2))
    mesh = make_mesh()
    sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    g_mesh = grads(make_render_fn_multi(scene, cfg, pix, spp=2,
                                        ray_sharding=sh))
    for n_ in names:
        np.testing.assert_allclose(
            np.asarray(g_mesh[n_]), np.asarray(g_single[n_]),
            rtol=2e-3, atol=1e-6,
        )
