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
