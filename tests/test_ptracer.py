"""Particle tracer and VPL tests.

Parity model: reference mitsuba/src/integrators/ptracer/ptracer.cpp and
integrators/vpl/vpl.cpp. The key invariant is estimator agreement: light
tracing and camera tracing integrate the same measurement, so the images
must match within MC noise; VPL is biased (clamped G) so it is held to a
looser tolerance.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import ptracer as pt  # noqa: E402
from sdmm_tpu.render.renderer import render  # noqa: E402
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder  # noqa: E402


def test_emission_sampling_energy():
    """Total sampled emitted power matches the analytic emitter power."""
    scene, cfg = make_box_scene().build()
    em = pt.sample_emission(scene, jax.random.PRNGKey(0), 8192)
    # beta = Le*pi/pdf_A; E[beta] = Le*pi*A_total = emitted power (one-sided).
    area = float(np.asarray(scene.em_tri_area).sum())
    le = float(np.asarray(scene.emitter_radiance)[0, 0])
    expect = le * np.pi * area
    got = float(em["beta"].mean(0)[0])
    assert abs(got - expect) < 0.02 * expect, (got, expect)


def test_camera_connect_roundtrip():
    """Points along camera rays project back to their pixel."""
    from sdmm_tpu.scene.sensor import generate_rays

    scene, cfg = make_box_scene(64, 48).build()
    w, h = 64, 48
    pix = jnp.arange(0, w * h, 97, dtype=jnp.int32)
    px = (pix % w).astype(jnp.float32) + 0.5
    py = (pix // w).astype(jnp.float32) + 0.5
    ro, rd = generate_rays(scene, jnp.stack([px, py], -1), w, h)
    p = ro + 2.0 * rd
    cc = pt.camera_connect(scene, p, w, h)
    assert bool(jnp.all(cc["valid"]))
    assert np.array_equal(np.asarray(cc["pix"]), np.asarray(pix))
    # Direction points back at the camera.
    d_expect = -rd
    assert np.allclose(np.asarray(cc["d"]), np.asarray(d_expect), atol=1e-5)


def test_ptracer_matches_pathtracer():
    scene, cfg = make_box_scene(32, 32).build()
    cfg.max_depth = 5
    cfg.rr_depth = 5
    res_p = pt.render_ptracer(scene, cfg, spp=256, paths_per_wave=1 << 15)
    res_c = render(scene, cfg, spp=48)
    ip = res_p["image"]
    ic = np.asarray(res_c["image"])
    assert abs(ip.mean() - ic.mean()) < 0.04 * ic.mean(), (ip.mean(), ic.mean())
    # Blockwise agreement rules out We/vignetting errors.
    bp = ip.reshape(4, 8, 4, 8, 3).mean((1, 3, 4))
    bc = ic.reshape(4, 8, 4, 8, 3).mean((1, 3, 4))
    assert np.all(np.abs(bp / bc - 1.0) < 0.15), (bp / bc)


def test_vpl_approximates_global_illumination():
    scene, cfg = make_box_scene(24, 24).build()
    cfg.max_depth = 5
    cfg.rr_depth = 5
    res_v = pt.render_vpl(scene, cfg, spp=4, n_light_paths=64, vpl_depth=3)
    res_c = render(scene, cfg, spp=32)
    iv = np.asarray(res_v["image"])
    ic = np.asarray(res_c["image"])
    assert np.isfinite(iv).all()
    # Clamped-G bias: expect within ~25% of the unbiased render, and
    # strictly more energy than direct-only lighting.
    from sdmm_tpu.render import classic
    from sdmm_tpu.render.renderer import render as rr

    res_d = rr(scene, cfg, spp=16, trace_fn=lambda s, k, o, d:
               classic.trace_direct(s, k, o, d))
    idir = np.asarray(res_d["image"])
    assert abs(iv.mean() - ic.mean()) < 0.25 * ic.mean(), (iv.mean(), ic.mean())
    assert iv.mean() > idir.mean() * 1.02, (iv.mean(), idir.mean())


def test_collimated_beam():
    """Collimated beam (reference: src/emitters/collimated.cpp): invisible
    to NEE/path tracing, deposits its power via light tracing."""
    import sdmm_tpu.scene.shapes as shp

    b = SceneBuilder()
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.7, 0.7, 0.7])
    rot = np.eye(4)
    a = np.deg2rad(-90.0)
    rot[1:3, 1:3] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    b.add_shape(shp.make_rectangle(rot, False), white)
    cam = np.eye(4)
    cam[:3, 3] = [0.0, 1.0, 2.5]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0
    b.set_sensor(cam, 60.0, 32, 32)
    b.add_collimated_light([0.2, 1.0, 0.0], [0.0, -1.0, 0.0], [5.0, 5.0, 5.0])
    scene, cfg = b.build()

    res = pt.render_ptracer(scene, cfg, spp=64, paths_per_wave=1 << 14)
    img = np.asarray(res["image"]).reshape(cfg.height, cfg.width, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # the lit spot scatters into the camera

    # NEE direct sampling never reaches a doubly-delta emitter.
    from sdmm_tpu.scene import emitters as em_mod

    p = jnp.zeros((64, 3)).at[:, 1].set(0.5)
    rec = em_mod.sample_direct(
        scene, p, jnp.linspace(0, 0.99, 64), jax.random.uniform(
            jax.random.PRNGKey(3), (64, 2))
    )
    assert not bool(np.asarray(rec["valid"]).any())
