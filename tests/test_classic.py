"""Tests for the classic utility integrators (direct, ao, field).

Parity model: reference mitsuba/src/integrators/direct/{direct,ao}.cpp and
misc/field.cpp. `direct` must agree with a depth-2 NEE path trace (same
estimator); `ao` and `field` are checked against geometry ground truth.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import classic  # noqa: E402
from sdmm_tpu.render.volpath import trace_wave  # noqa: E402
from sdmm_tpu.scene.sensor import generate_rays  # noqa: E402


def _camera_wave(scene, cfg, key, n=4096):
    w, h = cfg.width, cfg.height
    pix = jax.random.randint(key, (n,), 0, w * h)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    px = (pix % w).astype(jnp.float32) + u[:, 0]
    py = (pix // w).astype(jnp.float32) + u[:, 1]
    return generate_rays(scene, jnp.stack([px, py], -1), w, h)


def test_direct_matches_depth2_path():
    # Depth-2 transport is emitted + one-bounce direct light, with OR
    # without NEE (the reference gates NEE by maxDepth: volpath.cpp breaks
    # before NEE once depth >= maxDepth, so depth-2 NEE adds no extra
    # segment). Depth-3 WITH NEE carries one indirect bounce and is higher.
    scene, cfg = make_box_scene(48, 48).build()
    key = jax.random.PRNGKey(3)
    ro, rd = _camera_wave(scene, cfg, key, n=8192)
    acc_d = acc_p = acc_nee2 = acc_nee3 = 0.0
    reps = 16
    for s in range(reps):
        kd = jax.random.fold_in(key, 100 + s)
        acc_d += float(classic.trace_direct(scene, kd, ro, rd).mean())
        acc_p += float(
            trace_wave(scene, kd, ro, rd, max_depth=2, rr_depth=10, nee=False).mean()
        )
        acc_nee2 += float(
            trace_wave(scene, kd, ro, rd, max_depth=2, rr_depth=10, nee=True).mean()
        )
        acc_nee3 += float(
            trace_wave(scene, kd, ro, rd, max_depth=3, rr_depth=10, nee=True).mean()
        )
    acc_d /= reps
    acc_p /= reps
    acc_nee2 /= reps
    acc_nee3 /= reps
    assert abs(acc_d - acc_p) < 0.05 * max(acc_p, 1e-6), (acc_d, acc_p)
    assert abs(acc_d - acc_nee2) < 0.05 * max(acc_d, 1e-6), (acc_d, acc_nee2)
    assert acc_nee3 > acc_d * 1.02, (acc_nee3, acc_d)


def test_direct_multi_sample_reduces_variance():
    scene, cfg = make_box_scene(32, 32).build()
    key = jax.random.PRNGKey(5)
    ro, rd = _camera_wave(scene, cfg, key, n=2048)

    def estimator_var(es, bs, reps=6):
        means = [
            float(
                classic.trace_direct(
                    scene, jax.random.fold_in(key, 7 * r), ro, rd,
                    emitter_samples=es, bsdf_samples=bs,
                ).mean()
            )
            for r in range(reps)
        ]
        return np.var(means), np.mean(means)

    v1, m1 = estimator_var(1, 1)
    v4, m4 = estimator_var(4, 4)
    # Means agree; 4x samples strictly lowers run-to-run variance.
    assert abs(m1 - m4) < 0.08 * max(m1, 1e-6), (m1, m4)
    assert v4 < v1 * 1.05, (v1, v4)


def test_ao_open_plane_and_closed_box():
    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder

    # Open plane: nothing occludes -> AO = 1 on the plane.
    b = SceneBuilder()
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.5, 0.5, 0.5])
    m = np.eye(4)
    m[:3, :3] = np.diag([5.0, 5.0, 5.0])
    rot = np.eye(4)
    a = np.deg2rad(-90)
    rot[1:3, 1:3] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    b.add_shape(shp.make_rectangle(rot @ m), white)
    cam = np.eye(4)
    cam[:3, 3] = [0, 2, 0]
    cam[1, 1], cam[1, 2] = 0, -1
    cam[2, 1], cam[2, 2] = 1, 0  # look down -y
    b.set_sensor(cam, fov_deg=40.0, width=16, height=16)
    scene, cfg = b.build()
    ro, rd = _camera_wave(scene, cfg, jax.random.PRNGKey(0), n=1024)
    ao = classic.trace_ao(scene, jax.random.PRNGKey(1), ro, rd, shading_samples=4)
    assert float(ao.mean()) > 0.97, float(ao.mean())

    # Closed box interior: finite-length AO < 1.
    scene, cfg = make_box_scene(16, 16).build()
    ro, rd = _camera_wave(scene, cfg, jax.random.PRNGKey(2), n=1024)
    ao = classic.trace_ao(scene, jax.random.PRNGKey(3), ro, rd, shading_samples=4)
    v = float(ao.mean())
    assert 0.05 < v < 0.95, v


def test_field_outputs():
    scene, cfg = make_box_scene(24, 24).build()
    # Ray straight down the camera axis hits the back wall at z=-1, t=5.
    ro = jnp.array([[0.0, 1.0, 4.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    key = jax.random.PRNGKey(0)
    dist = classic.trace_field(scene, key, ro, rd, field="distance")
    assert abs(float(dist[0, 0]) - 5.0) < 1e-3
    pos = classic.trace_field(scene, key, ro, rd, field="position")
    assert np.allclose(np.asarray(pos[0]), [0, 1, -1], atol=1e-3)
    nrm = classic.trace_field(scene, key, ro, rd, field="shNormal")
    assert abs(abs(float(nrm[0, 2])) - 1.0) < 1e-3
    alb = classic.trace_field(scene, key, ro, rd, field="albedo")
    assert np.allclose(np.asarray(alb[0]), [0.725, 0.71, 0.68], atol=1e-3)
    rel = classic.trace_field(scene, key, ro, rd, field="relPosition")
    # Camera space: the hit is 5 units along the view axis.
    assert abs(np.abs(np.asarray(rel[0])).max() - 5.0) < 1e-3


def test_multichannel():
    scene, cfg = make_box_scene(16, 16).build()
    out = classic.render_multichannel(
        scene, cfg, fields=("distance", "shNormal"), spp=2
    )
    assert set(out) == {"distance", "shNormal"}
    assert out["distance"].shape == (16, 16, 3)
    assert float(np.asarray(out["distance"]).mean()) > 0.5


def test_adaptive_allocates_and_converges():
    from sdmm_tpu.render.classic import render_adaptive

    scene, cfg = make_box_scene(24, 24).build()
    cfg.max_depth = 4
    cfg.rr_depth = 4
    res = render_adaptive(scene, cfg, max_spp=32, pass_spp=4,
                          max_error=0.06, rays_per_wave=1 << 12)
    im = res["image"]
    spp = res["spp_map"]
    assert np.isfinite(im).all()
    assert spp.min() >= 4  # everyone got the first pass
    assert spp.max() <= 32 + 1e-6
    # Adaptive must not spend max samples everywhere (some pixels converge),
    # and the image must match a fixed-spp render.
    assert spp.mean() < 31, spp.mean()
    from sdmm_tpu.render.renderer import render as rr

    ref = np.asarray(rr(scene, cfg, spp=48)["image"])
    assert abs(im.mean() - ref.mean()) < 0.06 * ref.mean()
