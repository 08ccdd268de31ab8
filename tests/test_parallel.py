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
    """The psum'd 8-device film equals a SINGLE-device rendering of the
    same shards with the same per-shard key folds — the cross-device film
    parity claim (not just determinism)."""
    from sdmm_tpu.render.volpath import trace_wave
    from sdmm_tpu.scene.sensor import generate_rays

    scene, cfg = box
    mesh = make_mesh()
    step = build_render_step(scene, cfg, mesh)
    n_pix = cfg.width * cfg.height
    n = n_pix * 8
    pix = jnp.arange(n, dtype=jnp.int32) % n_pix
    key = jax.random.PRNGKey(5)
    img_dist = np.asarray(step(pix, key))

    # Single-device replay: shard d traces pixels [d*n/8, (d+1)*n/8) with
    # key fold_in(key, d) — mirrors build_render_step's shard_body.
    w, h = cfg.width, cfg.height
    img_ref = np.zeros((n_pix, 3))
    per = n // 8
    for d in range(8):
        kd = jax.random.fold_in(key, d)
        kj, kt = jax.random.split(kd)
        idx = pix[d * per:(d + 1) * per]
        u = jax.random.uniform(kj, (per, 2))
        px = (idx % w).astype(jnp.float32) + u[:, 0]
        py = (idx // w).astype(jnp.float32) + u[:, 1]
        ro, rd = generate_rays(
            scene, jnp.stack([px, py], axis=-1), w, h, cfg.fov_axis
        )
        li = trace_wave(
            scene, kt, ro, rd, max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth, bsdf_types=cfg.bsdf_types or None,
        )
        li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
        img_ref += np.asarray(jnp.zeros((n_pix, 3)).at[idx].add(li))

    np.testing.assert_allclose(img_dist, img_ref, rtol=1e-4, atol=1e-5)


def test_trainer_on_mesh_matches_single_device(box):
    """The REAL SDMMTrainer sharded over 8 devices (GSPMD through the
    unmodified algorithm) is estimator-equivalent to the single-device
    trainer at equal seeds: same film, same trained mixtures up to float
    reassociation.

    Runs PAST the canBeOptimized gate (total_spp > 12, counts >= 8,
    cumulative leaf counts >= 64 — reference volpath_sdmm.cpp:140-149):
    2 iterations x 16 spp so the second optimize() genuinely trains, and
    the mixture parity below compares EM-updated parameters, not the
    untouched initialization."""
    from sdmm_tpu.guiding.trainer import SDMMTrainer

    # Free accumulated executables first: under the full suite this test
    # otherwise segfaults XLA-CPU on the 2-vCPU host (memory pressure).
    jax.clear_caches()

    scene, cfg = box
    tc = TrainerConfig(
        n_components=8, max_leaves=32, split_threshold=500,
        samples_per_iteration=16, rays_per_wave=512,
        em=em_mod.EMConfig(batch_size=256),
        # Both sides must run the identical scan-tracer algorithm for
        # seed-for-seed parity (the single-device default is the pooled
        # collector, whose RNG realization differs; pooled-vs-scan
        # equivalence is tested statistically in test_guided.py).
        pooled_training=False,
    )

    def run(mesh):
        tr = SDMMTrainer(scene, cfg, tc, mesh=mesh)
        trained = 0
        # 2 iterations x 16 spp: the second optimize sees total_spp = 16
        # > 12, so the canBeOptimized gate fires and EM genuinely runs.
        for _ in range(2):
            img, sqr, wgt, batches = tr.render_iteration(collect=True)
            trained = max(trained, tr.optimize(batches))
            tr.iteration += 1
            tr.total_spp += tc.samples_per_iteration
        # One more render AFTER training: guided sampling against the
        # trained mixtures (VERDICT r3 #7 — the parity below must cover
        # the GUIDED iteration, with conditionals actually created).
        img_g, _, _, batches_g = tr.render_iteration(collect=True)
        n_try = sum(float(s.get("n_cond_try", 0.0)) for s in batches_g)
        n_ok = sum(float(s.get("n_cond_ok", 0.0)) for s in batches_g)
        return (np.asarray(img), np.asarray(tr.sdmm.weight),
                np.asarray(tr.sdmm.mean), np.asarray(tr.initialized),
                trained, np.asarray(tr.em.iterations),
                np.asarray(img_g), n_try, n_ok)

    img_s, w_s, mu_s, init_s, trained_s, it_s, img_gs, try_s, ok_s = run(None)
    img_m, w_m, mu_m, init_m, trained_m, it_m, img_gm, try_m, ok_m = run(
        make_mesh())
    # The gate fired and EM actually ran on some leaves.
    assert trained_s > 0 and trained_m > 0
    assert init_s.any() and (it_s[init_s.nonzero()[0][0]] > 0).any()
    np.testing.assert_allclose(img_m, img_s, rtol=2e-3, atol=1e-4)
    np.testing.assert_array_equal(init_m, init_s)
    # Post-training guided render: conditionals were genuinely created
    # from trained mixtures, identically across 1 vs 8 devices.
    assert ok_s > 0 and ok_m > 0, (ok_s, ok_m)
    assert (try_m, ok_m) == (try_s, ok_s)
    np.testing.assert_allclose(img_gm, img_gs, rtol=2e-3, atol=1e-4)
    # Trained parameters moved away from their initialization...
    from sdmm_tpu.guiding import init as init_mod_

    tr0 = SDMMTrainer(scene, cfg, tc, mesh=None)
    w0 = np.asarray(tr0.sdmm.weight)
    moved = np.abs(w_s[init_s] - w0[init_s]).max()
    assert moved > 1e-4, "EM left the weights at their init values"
    # ...and agree across 1 vs 8 devices up to float reassociation.
    np.testing.assert_allclose(w_m, w_s, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(mu_m[init_s], mu_s[init_s], rtol=2e-3,
                               atol=2e-4)
