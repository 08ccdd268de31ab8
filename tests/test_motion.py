"""Motion-vector integrator tests (render/classic.py trace_motion).

Parity model: reference mitsuba/src/integrators/misc/motion.cpp ('d'
config) with keyframed toWorld animation (core/track.h). The animated
sphere of test-suite/scenes/cornell-box-motion moves from y=1.2 to y=1.0:
its pixels must carry downward... (screen +y) motion; static geometry
must report zero.
"""

import numpy as np

from sdmm_tpu.scene.xml_loader import load_scene


def test_motion_scene_loads_with_keyframes():
    b = load_scene(
        "/root/reference/test-suite/scenes/cornell-box-motion/"
        "cornell-box-motion.xml",
        overrides={"integrator": "motion"},
    )
    scene, cfg = b.build()
    tm = np.asarray(scene.tri_mot)
    assert (tm >= 0).any(), "animated sphere should carry motion ids"
    m0 = np.asarray(scene.mot_m0[0])
    m1 = np.asarray(scene.mot_m1[0])
    # Keyframes differ only in the y translation (1.2 -> 1.0).
    assert abs(m0[1, 3] - 1.2) < 1e-6 and abs(m1[1, 3] - 1.0) < 1e-6


def test_motion_vectors():
    import jax

    from sdmm_tpu.render.classic import trace_motion
    from sdmm_tpu.scene.sensor import generate_rays
    import jax.numpy as jnp

    b = load_scene(
        "/root/reference/test-suite/scenes/cornell-box-motion/"
        "cornell-box-motion.xml",
        overrides={"integrator": "motion"},
    )
    scene, cfg = b.build()
    w, h = 64, 36
    pix = jnp.arange(w * h, dtype=jnp.int32)
    px = (pix % w).astype(jnp.float32) + 0.5
    py = (pix // w).astype(jnp.float32) + 0.5
    ro, rd = generate_rays(scene, jnp.stack([px, py], -1), w, h, cfg.fov_axis)
    mv = np.asarray(trace_motion(scene, jax.random.PRNGKey(0), ro, rd,
                                 width=w, height=h, time=1.0))
    assert np.isfinite(mv).all()
    moving = np.abs(mv[:, 1]) > 0.1
    assert moving.sum() > 5, "sphere visible pixels should move"
    # World -y motion appears as screen +y (rows grow downward) and no
    # sideways drift for a pure y translation.
    assert mv[moving, 1].mean() > 0.0
    assert abs(mv[moving, 0].mean()) < 0.2
    # Majority of the image (static walls) has zero motion.
    assert (np.abs(mv[:, :2]).max(-1) < 1e-4).mean() > 0.8
