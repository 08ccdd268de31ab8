"""Irradiance cache tests (render/irrcache.py).

Parity model: reference mitsuba/src/integrators/misc/irrcache.cpp — the
cached render must approximate the path-traced ground truth (the cache
interpolates indirect irradiance; direct light is exact), and the cache
records themselves must carry physically sensible irradiance.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import irrcache as ic  # noqa: E402
from sdmm_tpu.render.renderer import render  # noqa: E402


def _small(monkey_table=512):
    ic.TABLE = monkey_table
    scene, cfg = make_box_scene(32, 32).build()
    cfg.max_depth = 5
    cfg.rr_depth = 5
    return scene, cfg


def test_cache_build_places_records():
    scene, cfg = _small()
    cache = ic.build_cache(
        scene, jax.random.PRNGKey(0), cfg.width, cfg.height,
        grid_res=12, gather_res=6, bsdf_types=cfg.bsdf_types or None,
        max_depth=4, n_candidates=1 << 12,
    )
    valid = np.asarray(cache["valid"])
    assert valid.sum() > 20  # box walls covered
    e = np.asarray(cache["E"])[valid]
    assert np.isfinite(e).all()
    assert (e >= 0).all()
    assert e.max() > 1e-3  # indirect light exists in the box
    r = np.asarray(cache["R"])[valid]
    cell = float(np.asarray(cache["cell"]))
    assert (r >= 0.74 * cell).all() and (r <= 3.01 * cell).all()


def test_irrcache_matches_path_tracer():
    scene, cfg = _small()
    res_c = ic.render_irrcache(scene, cfg, spp=24, grid_res=16, gather_res=8)
    res_p = render(scene, cfg, spp=48)
    img_c = np.asarray(res_c["image"])
    img_p = np.asarray(res_p["image"])
    m_c = img_c.mean()
    m_p = img_p.mean()
    # The cache is biased (interpolation, depth-limited gather); hold the
    # mean to 15% and the per-pixel smoothed error loosely.
    assert abs(m_c - m_p) / m_p < 0.15, (m_c, m_p)
    assert np.isfinite(img_c).all()


def test_indirect_only_darker_than_full():
    scene, cfg = _small()
    res_i = ic.render_irrcache(scene, cfg, spp=8, grid_res=12, gather_res=6,
                               indirect_only=True)
    res_f = ic.render_irrcache(scene, cfg, spp=8, grid_res=12, gather_res=6)
    assert np.asarray(res_i["image"]).mean() < np.asarray(res_f["image"]).mean()
