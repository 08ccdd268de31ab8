"""BDPT tests.

Parity model: reference mitsuba/src/integrators/bdpt/bdpt.cpp (strategy
enumeration + pathWeight MIS, LightImage splats in bdpt_wr.cpp). The
estimator must agree with the unbiased unidirectional tracer, including on
scenes with delta BSDFs (the MIS walk's delta-flag handling), and the MIS
weights of all strategies for a given path length must stay in (0, 1].
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

import sdmm_tpu.scene.shapes as shp  # noqa: E402
from sdmm_tpu.render import bdpt as bd  # noqa: E402
from sdmm_tpu.render.renderer import render  # noqa: E402
from sdmm_tpu.scene.scene import BSDF_CONDUCTOR, BSDF_DIELECTRIC  # noqa: E402


def test_bdpt_matches_pathtracer_diffuse():
    scene, cfg = make_box_scene(32, 32).build()
    cfg.max_depth = 6
    cfg.rr_depth = 12
    out = bd.render_bdpt(scene, cfg, spp=10, rays_per_wave=1 << 10)
    cfg.max_depth = 10
    res_c = render(scene, cfg, spp=40)
    ib = out["image"]
    ic = np.asarray(res_c["image"])
    assert np.isfinite(ib).all()
    ratio = ib.mean() / ic.mean()
    assert abs(ratio - 1.0) < 0.05, ratio
    bp = ib.reshape(4, 8, 4, 8, 3).mean((1, 3, 4))
    bc = ic.reshape(4, 8, 4, 8, 3).mean((1, 3, 4))
    assert np.all(np.abs(bp / bc - 1.0) < 0.15), bp / bc


def test_bdpt_with_delta_bsdfs():
    b = make_box_scene(24, 24)
    mirror = b.add_bsdf(BSDF_CONDUCTOR, albedo=[0.9, 0.9, 0.9])
    glass = b.add_bsdf(BSDF_DIELECTRIC, eta=1.5)
    b.add_shape(
        shp.make_sphere(np.array([-0.45, 0.4, 0.2]), 0.35, np.eye(4)), mirror
    )
    b.add_shape(
        shp.make_sphere(np.array([0.5, 0.35, -0.1]), 0.3, np.eye(4)), glass
    )
    scene, cfg = b.build()
    cfg.max_depth = 7
    cfg.rr_depth = 12
    out = bd.render_bdpt(scene, cfg, spp=12, rays_per_wave=1 << 10)
    cfg.max_depth = 11
    res_c = render(scene, cfg, spp=48)
    ratio = out["image"].mean() / np.asarray(res_c["image"]).mean()
    assert abs(ratio - 1.0) < 0.07, ratio


def test_light_subpath_pdfs_finite_and_consistent():
    scene, cfg = make_box_scene().build()
    key = jax.random.PRNGKey(0)
    l0 = bd._sample_light_origin(scene, key, 512)
    assert bool(jnp.all(l0["pdf_pos"] > 0))
    # Emitted direction is on the emitter's front side.
    assert bool(jnp.all(jnp.sum(l0["d"] * l0["n"], axis=-1) > -1e-6))
    beta1 = l0["Le"] * (jnp.pi / l0["pdf_pos"])[:, None]
    lw = bd._walk(scene, key, l0["p"] + l0["n"] * 1e-4, l0["d"], beta1,
                  l0["pdf_dir"], 3, None)
    lv = bd._prepend_light_origin(l0, lw, 3)
    for k in ("pdf_fwd", "pdf_rev", "beta"):
        assert bool(jnp.all(jnp.isfinite(lv[k]))), k
    # Forward pdfs of reached vertices are positive.
    v = np.asarray(lv["valid"])
    pf = np.asarray(lv["pdf_fwd"])
    assert (pf[v] > 0).mean() > 0.99


def test_mis_weights_bounded():
    """Weights of executed strategies lie in (0, 1]."""
    scene, cfg = make_box_scene(16, 16).build()
    key = jax.random.PRNGKey(3)
    n = 256
    pix = jax.random.randint(key, (n,), 0, 16 * 16)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    px = (pix % 16).astype(jnp.float32) + u[:, 0]
    py = (pix // 16).astype(jnp.float32) + u[:, 1]
    li, splat = bd.trace_bdpt(scene, key, jnp.stack([px, py], -1), 16, 16,
                              max_depth=5)
    assert np.isfinite(np.asarray(li)).all()
    assert np.isfinite(np.asarray(splat)).all()
    assert (np.asarray(li) >= 0).all()
