"""Regenerating wavefront pool renderer: correctness vs the classic driver.

The pool must produce exactly spp samples per pixel and agree with the
classic fixed-wave renderer within MC noise (same estimator, different
schedule)."""

import numpy as np
import pytest

from sdmm_tpu.render.renderer import render
from sdmm_tpu.render.wavefront import render_wavefront

import sys

sys.path.insert(0, "tests")
from test_render import make_box_scene


@pytest.fixture(scope="module")
def box():
    b = make_box_scene(32, 32)
    scene, cfg = b.build()
    cfg.max_depth = 6
    cfg.rr_depth = 6
    return scene, cfg


def test_exact_sample_count(box):
    scene, cfg = box
    res = render_wavefront(scene, cfg, spp=16, seed=0, n_lanes=1024)
    np.testing.assert_array_equal(res["weight"], 16.0)


def test_matches_classic_within_noise(box):
    scene, cfg = box
    res_w = render_wavefront(scene, cfg, spp=128, seed=3, n_lanes=4096)
    res_c = render(scene, cfg, spp=128, seed=11)
    mw = res_w["image"].mean()
    mc = np.asarray(res_c["image"]).mean()
    assert abs(mw - mc) / mc < 0.02, (mw, mc)


def test_no_nee_matches_nee(box):
    scene, cfg = box
    res_n = render_wavefront(scene, cfg, spp=64, seed=5, n_lanes=4096, nee=True)
    res_b = render_wavefront(scene, cfg, spp=512, seed=7, n_lanes=4096, nee=False)
    mn = res_n["image"].mean()
    mb = res_b["image"].mean()
    assert abs(mn - mb) / mb < 0.05, (mn, mb)


def test_odd_sizes_covered():
    b = make_box_scene(17, 13)  # not divisible by lanes
    scene, cfg = b.build()
    cfg.max_depth = 4
    cfg.rr_depth = 4
    res = render_wavefront(scene, cfg, spp=3, seed=2, n_lanes=64)
    np.testing.assert_array_equal(res["weight"], 3.0)
    assert np.isfinite(res["image"]).all()
