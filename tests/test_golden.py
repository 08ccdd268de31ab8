"""Golden-image regression vs a committed high-spp self-GT.

tests/golden/cornell-box-128x72.exr: the reference cornell-box rendered
by this repo's NEE path tracer at 32768 spp on TPU (the reference's own
GT protocol, run_tests.sh + _integrators/gt.xml — its GT EXRs are
git-lfs stubs in this checkout). Any estimator drift in the tracer —
BSDF weights, NEE/MIS, emitter CDF, camera mapping — shifts the render
against this anchor and fails here."""

import os

import numpy as np
import pytest

from sdmm_tpu.render.renderer import render
from sdmm_tpu.scene.xml_loader import load_scene
from sdmm_tpu.utils.exr import read_exr

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell-box-128x72.exr")
SCENE = "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml"


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(SCENE):
        pytest.skip("reference scene unavailable")
    return read_exr(GOLDEN)


def test_nee_render_matches_golden(golden):
    scene, cfg = load_scene(SCENE, overrides={"integrator": "gt"}).build()
    cfg.width, cfg.height = 128, 72
    cfg.max_depth = 10
    cfg.rr_depth = 10
    res = render(scene, cfg, spp=96, seed=3, nee=True)
    img = np.asarray(res["image"])
    assert img.shape == golden.shape
    # Fixed seed: deterministic up to float reassociation. Measured at
    # creation: seed 3 @ 96 spp sits 1.7% from the golden mean (depth-10
    # indirect noise dominates even with NEE; seed spread at 24 spp is
    # +-10%). 4% flags estimator drift.
    assert abs(img.mean() - golden.mean()) / golden.mean() < 0.04, (
        img.mean(), golden.mean())
    # 8x8-pixel blocks: ~6k samples each.
    bi = img.mean(-1).reshape(9, 8, 16, 8).mean((1, 3))
    bg = golden.mean(-1).reshape(9, 8, 16, 8).mean((1, 3))
    rel = np.abs(bi - bg) / np.maximum(bg, 0.05)
    assert np.median(rel) < 0.08, np.median(rel)


def test_guided_trainer_matches_golden(golden):
    """The full SDMM training loop converges to the same image."""
    from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig

    scene, cfg = load_scene(
        SCENE, overrides={"integrator": "sdmm", "samplesPerIteration": 8},
    ).build()
    cfg.width, cfg.height = 128, 72
    cfg.max_depth = 10
    cfg.rr_depth = 10
    tr = SDMMTrainer(scene, cfg, TrainerConfig(samples_per_iteration=8))
    img, _ = tr.run(32)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # Unguided (no-NEE) MC noise at 32 spp is large — fixed seed 1234
    # measured 0.286 at creation; 0.4 flags estimator drift, not noise.
    bi = img.mean(-1).reshape(9, 8, 16, 8).mean((1, 3))
    bg = golden.mean(-1).reshape(9, 8, 16, 8).mean((1, 3))
    rel = np.abs(bi - bg) / np.maximum(bg, 0.05)
    assert np.median(rel) < 0.4, np.median(rel)
