"""Photon mapping tests (photonmapper / SPPM).

Parity model: reference mitsuba/src/integrators/photonmapper/
{photonmapper,sppm}.cpp. Density estimation is biased (boundary bias at
wall edges, finite radius), so the global tolerance vs the unbiased path
tracer is looser than the ptracer test, while interior blocks are tight.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import photonmap as pm  # noqa: E402
from sdmm_tpu.render.renderer import render  # noqa: E402


def test_photon_grid_queries():
    scene, cfg = make_box_scene().build()
    photons = pm.trace_photons(scene, jax.random.PRNGKey(0), 4096, max_depth=4)
    photons = dict(photons)
    photons["power"] = photons["power"] / 4096
    grid = pm.build_photon_grid(scene, photons, 0.1)
    cids = np.asarray(grid["cids"])
    assert (np.diff(cids) >= 0).all()  # sorted
    order = np.asarray(grid["order"])
    assert len(np.unique(order)) == len(order)  # a permutation
    # Valid photons come first (sentinel cells last).
    valid = np.asarray(photons["valid"])[order]
    n_valid = valid.sum()
    assert valid[:n_valid].all()


def test_photonmapper_matches_pathtracer():
    scene, cfg = make_box_scene(32, 32).build()
    cfg.max_depth = 6
    cfg.rr_depth = 6
    res_pm = pm.render_photonmap(scene, cfg, spp=4, n_photon_paths=1 << 16)
    res_c = render(scene, cfg, spp=48)
    ipm = np.asarray(res_pm["image"])
    ic = np.asarray(res_c["image"])
    assert np.isfinite(ipm).all()
    ratio = ipm.mean() / ic.mean()
    assert 0.90 < ratio < 1.06, ratio
    # Interior blocks (away from wall boundaries) are tighter.
    bp = ipm.reshape(4, 8, 4, 8, 3).mean((1, 3, 4))
    bc = ic.reshape(4, 8, 4, 8, 3).mean((1, 3, 4))
    inner = (bp / bc)[1:3, 1:3]
    assert np.all(np.abs(inner - 1.0) < 0.06), inner


def test_sppm_radius_shrinks_and_converges():
    scene, cfg = make_box_scene(24, 24).build()
    cfg.max_depth = 6
    cfg.rr_depth = 6
    res = pm.render_sppm(scene, cfg, iterations=6,
                         photon_paths_per_iter=1 << 14)
    res_c = render(scene, cfg, spp=32)
    isp = np.asarray(res["image"])
    ic = np.asarray(res_c["image"])
    assert np.isfinite(isp).all()
    ratio = isp.mean() / ic.mean()
    assert 0.88 < ratio < 1.10, ratio
    # The gather radius must have shrunk from its initial value.
    import numpy as _np

    diag = float(_np.linalg.norm(_np.asarray(scene.aabb_hi - scene.aabb_lo)))
    r2_init = (0.03 * diag) ** 2
    assert res["r2"].mean() < 0.95 * r2_init
