"""End-to-end SDMM guided training tests on a small closed box scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig
from sdmm_tpu.guiding import em as em_mod
from sdmm_tpu.render.renderer import render

from test_render import make_box_scene


@pytest.fixture(scope="module")
def trained():
    b = make_box_scene(24, 24)
    scene, cfg = b.build()
    cfg.max_depth = 4
    cfg.rr_depth = 4
    tc = TrainerConfig(
        n_components=8,
        max_leaves=64,
        split_threshold=2000,
        samples_per_iteration=4,
        rays_per_wave=24 * 24,
        em=em_mod.EMConfig(batch_size=1 << 12),
    )
    trainer = SDMMTrainer(scene, cfg, tc)
    combined, iters = trainer.run(total_spp=48)
    return scene, cfg, trainer, combined, iters


def test_training_runs_and_activates_leaves(trained):
    scene, cfg, trainer, combined, iters = trained
    assert np.isfinite(combined).all()
    assert combined.mean() > 0.01
    assert int(jnp.sum(trainer.initialized)) > 0
    assert len(iters) == 12


def test_guided_image_matches_volpath(trained):
    """Guided estimator must stay unbiased: agree with plain PT in mean."""
    scene, cfg, trainer, combined, iters = trained
    ref = render(scene, cfg, spp=256, seed=11, rays_per_wave=24 * 24, nee=True)
    ref_img = np.asarray(ref["image"])
    # Use late (trained) iterations only.
    late = iters[len(iters) // 2 :]
    img = np.stack([it["image"] / np.maximum(it["weight"], 1)[:, None] for it in late])
    img = img.mean(0).reshape(ref_img.shape)
    rel = abs(img.mean() - ref_img.mean()) / ref_img.mean()
    assert rel < 0.15, (img.mean(), ref_img.mean())


def test_guided_variance_improves(trained):
    """Later (guided) iterations should have lower pixel variance than the
    first (unguided) iteration — the point of path guiding."""
    scene, cfg, trainer, combined, iters = trained

    def mean_var(it):
        n = np.maximum(it["weight"], 1.0)[:, None]
        mean = it["image"] / n
        var = np.maximum(it["sqr"] / n - mean * mean, 0) / np.maximum(n - 1, 1)
        return var.mean()

    v_first = mean_var(iters[0])
    v_late = np.mean([mean_var(i) for i in iters[-3:]])
    assert v_late < v_first * 0.9, (v_first, v_late)


def test_async_em_overlap_unbiased():
    """optimize_async renders with one-iteration-stale mixtures (the
    reference's double-buffer swap) and must stay unbiased."""
    b = make_box_scene(16, 16)
    scene, cfg = b.build()
    cfg.max_depth = 3
    cfg.rr_depth = 3
    tc = TrainerConfig(
        n_components=8, max_leaves=32, split_threshold=2000,
        samples_per_iteration=4, rays_per_wave=256,
        em=em_mod.EMConfig(batch_size=1 << 11), optimize_async=True,
        train_fraction=0.75,  # keep training past the totalSpp>12 gate
    )
    trainer = SDMMTrainer(scene, cfg, tc)
    combined, iters = trainer.run(total_spp=32)
    assert np.isfinite(combined).all()
    ref = render(scene, cfg, spp=256, seed=21, rays_per_wave=256, nee=True)
    rel = abs(combined.mean() - np.asarray(ref["image"]).mean()) / np.asarray(
        ref["image"]).mean()
    assert rel < 0.2, rel
    assert int(jnp.sum(trainer.initialized)) > 0
