"""Fused bounce megakernel (ops/bounce_pallas) vs the XLA wavefront pool.

Both drivers implement the same estimator (regenerating lane pool, NEE
with power-heuristic MIS, cosine-sampled diffuse, RR as in the reference
integrator sdmm_proc.cpp:858), so with enough samples their images must
agree to Monte-Carlo noise. Runs in Pallas interpret mode on CPU.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import wavefront as wf  # noqa: E402


def _render(scene, cfg, fused, spp, seed=7):
    lanes = 8192
    if fused:
        out = wf.render_pool_fused(
            scene, jax.random.PRNGKey(seed), n_lanes=lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
            fov_axis=cfg.fov_axis, interpret=True,
        )
    else:
        out = wf.render_pool(
            scene, jax.random.PRNGKey(seed), n_lanes=lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
            nee=True, bsdf_types=cfg.bsdf_types or None,
            fov_axis=cfg.fov_axis,
        )
    img = np.asarray(out["image"])
    w = np.asarray(out["weight"])
    return img / np.maximum(w, 1.0)[:, None], out


def test_fused_gate_accepts_box_scene():
    scene, cfg = make_box_scene(32, 32).build()
    assert wf.fused_supported(scene, cfg)


def test_fused_matches_pool_image():
    scene, cfg = make_box_scene(24, 24).build()
    spp = 96
    img_f, out_f = _render(scene, cfg, fused=True, spp=spp)
    img_p, out_p = _render(scene, cfg, fused=False, spp=spp)

    # Every camera sample was consumed and splatted exactly once.
    n_pix = cfg.width * cfg.height
    assert float(np.asarray(out_f["weight"]).sum()) == n_pix * spp
    assert float(np.asarray(out_p["weight"]).sum()) == n_pix * spp

    # Same estimator, different RNG streams: means agree to MC noise.
    m_f = img_f.mean()
    m_p = img_p.mean()
    assert abs(m_f - m_p) / m_p < 0.05, (m_f, m_p)
    # Per-pixel: smoothed difference small relative to image mean.
    diff = np.abs(img_f - img_p).mean()
    assert diff / m_p < 0.35, (diff, m_p)

    # Path-vertex counts agree (same survival distribution).
    nv_f = float(out_f["n_vertices"])
    nv_p = float(out_p["n_vertices"])
    assert abs(nv_f - nv_p) / nv_p < 0.03, (nv_f, nv_p)


def test_fused_image_nontrivial():
    scene, cfg = make_box_scene(16, 16).build()
    img, out = _render(scene, cfg, fused=True, spp=32)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # light visible
    # Red wall tint on the left, green on the right.
    hw = img.reshape(cfg.height, cfg.width, 3)
    left = hw[:, :4].mean(axis=(0, 1))
    right = hw[:, -4:].mean(axis=(0, 1))
    assert left[0] > left[2]
    assert right[1] > right[0]


def _glossy_box_scene(w=24, h=24):
    """Box with conductor, dielectric and roughconductor rectangles on the
    walls — exercises every in-kernel BSDF model."""
    import numpy as np

    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu.scene.scene import (
        BSDF_CONDUCTOR,
        BSDF_DIELECTRIC,
        BSDF_ROUGHCONDUCTOR,
    )

    b = make_box_scene(w, h)
    mirror = b.add_bsdf(BSDF_CONDUCTOR, eta=0.2, k=[3.9, 2.45, 2.14])
    glass = b.add_bsdf(BSDF_DIELECTRIC, eta=1.5)
    rough = b.add_bsdf(BSDF_ROUGHCONDUCTOR, alpha=0.25, eta=0.2,
                       k=[3.9, 2.45, 2.14])

    def panel(translate, ry, bsdf):
        m = np.eye(4)
        m[:3, :3] = np.diag([0.35, 0.35, 1.0])
        rot = np.eye(4)
        a = np.deg2rad(ry)
        rot[0, 0] = rot[2, 2] = np.cos(a)
        rot[0, 2] = np.sin(a)
        rot[2, 0] = -np.sin(a)
        out = rot @ m
        out[:3, 3] = translate
        b.add_shape(shp.make_rectangle(out, False), bsdf)

    panel([-0.95, 1.0, 0.2], 90, mirror)
    panel([0.95, 0.7, -0.2], -90, rough)
    panel([0.0, 0.6, 0.3], 10, glass)
    return b.build()


def test_fused_multibsdf_matches_pool():
    """Conductor/dielectric/roughconductor lanes through the megakernel
    agree with the XLA pool's estimator."""
    scene, cfg = _glossy_box_scene()
    assert set(cfg.bsdf_types) > {0}
    assert wf.fused_supported(scene, cfg)
    spp = 64

    out_f = wf.render_pool_fused(
        scene, jax.random.PRNGKey(3), n_lanes=8192, spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, bsdf_types=tuple(cfg.bsdf_types),
        interpret=True,
    )
    out_p = wf.render_pool(
        scene, jax.random.PRNGKey(3), n_lanes=8192, spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        nee=True, bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
    )
    img_f = np.asarray(out_f["image"]) / np.maximum(
        np.asarray(out_f["weight"]), 1.0)[:, None]
    img_p = np.asarray(out_p["image"]) / np.maximum(
        np.asarray(out_p["weight"]), 1.0)[:, None]
    m_f, m_p = img_f.mean(), img_p.mean()
    assert abs(m_f - m_p) / m_p < 0.06, (m_f, m_p)
    nv_f = float(out_f["n_vertices"])
    nv_p = float(out_p["n_vertices"])
    assert abs(nv_f - nv_p) / nv_p < 0.04, (nv_f, nv_p)
