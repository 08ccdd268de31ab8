"""PSSMLT / ERPT tests.

Parity model: reference mitsuba/src/integrators/pssmlt/*.cpp and
erpt/erpt.cpp. The PSS measurement must reduce to the plain path-tracing
estimator under uniform samples; the Metropolis estimators must agree
with the unbiased path tracer on the box scene.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import pssmlt as ps  # noqa: E402
from sdmm_tpu.render.renderer import render  # noqa: E402


def test_eval_path_uniform_equals_path_tracer():
    scene, cfg = make_box_scene(32, 32).build()
    u = jax.random.uniform(jax.random.PRNGKey(0), (1 << 15, ps.pss_dims(5)))
    res = ps.eval_path(scene, u, 32, 32, max_depth=5)
    res_c = render(scene, cfg, spp=32)
    m_u = float(res["value"].mean())
    m_c = float(np.asarray(res_c["image"]).mean())
    assert abs(m_u - m_c) < 0.05 * m_c, (m_u, m_c)
    # Luminance weights: lum > 0 wherever value > 0.
    v = np.asarray(res["value"])
    lum = np.asarray(res["lum"])
    assert ((v.sum(-1) > 0) == (lum > 0)).mean() > 0.999


def test_small_step_wraps_and_stays_close():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (4096, 8))
    v = ps._small_step(key, u)
    v = np.asarray(v)
    assert (v >= 0).all() and (v < 1).all()
    # Perturbations are small in the wrapped metric.
    d = np.abs(np.asarray(u) - v)
    d = np.minimum(d, 1.0 - d)
    assert np.median(d) < 0.01
    assert d.max() < 1.0 / 32


def test_pssmlt_matches_pathtracer():
    scene, cfg = make_box_scene(32, 32).build()
    cfg.max_depth = 5
    cfg.rr_depth = 5
    out = ps.render_pssmlt(scene, cfg, spp=24, n_chains=1 << 13)
    res_c = render(scene, cfg, spp=32)
    im = out["image"]
    ic = np.asarray(res_c["image"])
    assert np.isfinite(im).all()
    assert 0.3 < out["acceptance"] < 0.95  # healthy chain mixing
    ratio = im.mean() / ic.mean()
    assert abs(ratio - 1.0) < 0.05, ratio


def test_erpt_matches_pathtracer():
    scene, cfg = make_box_scene(32, 32).build()
    cfg.max_depth = 5
    cfg.rr_depth = 5
    out = ps.render_erpt(scene, cfg, n_seeds=1 << 14, chain_length=16)
    res_c = render(scene, cfg, spp=32)
    ratio = out["image"].mean() / np.asarray(res_c["image"]).mean()
    assert abs(ratio - 1.0) < 0.08, ratio


def test_mlt_veach_mutations_match_path():
    """Veach-mutation MLT must integrate the same measurement as the path
    tracer (reference: mlt.cpp perturbations; restated in PSS)."""
    scene, cfg = make_box_scene(24, 24).build()
    cfg.max_depth = 5
    res_m = ps.render_pssmlt(scene, cfg, spp=48, n_chains=1 << 12,
                              n_bootstrap=1 << 14, mutations="veach")
    res_p = render(scene, cfg, spp=64)
    m_m = np.asarray(res_m["image"]).mean()
    m_p = np.asarray(res_p["image"]).mean()
    assert res_m["b"] > 0
    assert abs(m_m - m_p) / m_p < 0.12, (m_m, m_p)
    # Lens/caustic moves are local: acceptance should be healthy.
    assert res_m["acceptance"] > 0.2
