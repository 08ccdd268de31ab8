"""Mid-render checkpoint/resume (guiding/io.save_full_checkpoint).

Beyond-reference capability (SURVEY §5 notes the reference cannot resume
the EM state mid-render): an interrupted-and-restored training run must
produce the SAME images and guiding model as an uninterrupted one —
per-iteration RNG keys are derived from the iteration index, so equality
is exact.
"""

import sys

import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.guiding import io as gio  # noqa: E402
from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig  # noqa: E402


def _cfg():
    return TrainerConfig(
        samples_per_iteration=2, max_leaves=64, split_threshold=64,
        rays_per_wave=1 << 10, seed=5,
    )


def test_resume_matches_uninterrupted(tmp_path):
    scene, rc = make_box_scene(16, 16).build()
    rc.max_depth = 4
    rc.rr_depth = 4

    # Uninterrupted: 8 spp (4 iterations).
    t_full = SDMMTrainer(scene, rc, _cfg())
    img_full, iters_full = t_full.run(total_spp=8)

    # Interrupted after 2 iterations, checkpointed, restored, continued.
    t_a = SDMMTrainer(scene, rc, _cfg())
    _, iters_a = t_a.run(total_spp=4)
    ck = str(tmp_path / "resume.npz")
    gio.save_full_checkpoint(ck, t_a, iters_a)

    t_b = SDMMTrainer(scene, rc, _cfg())
    iters_b = t_b.restore(ck)
    assert t_b.iteration == t_a.iteration
    img_res, iters_res = t_b.run(total_spp=8, iters=iters_b)

    assert len(iters_res) == len(iters_full)
    for a, b in zip(iters_full, iters_res):
        np.testing.assert_allclose(a["image"], b["image"], rtol=1e-5,
                                   atol=1e-6)
    np.testing.assert_allclose(img_full, img_res, rtol=1e-5, atol=1e-6)
    # Guiding model state matches too.
    np.testing.assert_allclose(
        np.asarray(t_full.sdmm.weight), np.asarray(t_b.sdmm.weight),
        rtol=1e-5, atol=1e-7,
    )
    assert t_full.tree.n_leaves == t_b.tree.n_leaves
