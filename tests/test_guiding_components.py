"""Batch EM, k-means++ seeding, uniform grid + density normalization.

Reference parity targets: jmm/opt/batch.h (full-batch EM),
jmm/mixture_model_init.h:245 (kMeansPPInit), jmm/hash_grid.h (grids),
jmm/outlier_detection.h (density-normalized sample weights).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.guiding import em as em_mod
from sdmm_tpu.guiding import init as init_mod
from sdmm_tpu.guiding import mixture as mix
from sdmm_tpu.guiding.hashgrid import (
    UniformGrid,
    cell_counts,
    density_at,
    grid_cell,
    normalize_weights,
)


def _two_cluster_samples(n, key):
    """Directional samples from two fixed directions, one leaf."""
    k1, k2 = jax.random.split(key)
    pick = jax.random.uniform(k1, (n,)) < 0.5
    d0 = jnp.array([0.0, 0.0, 1.0])
    d1 = jnp.array([1.0, 0.0, 0.0])
    d = jnp.where(pick[:, None], d0, d1)
    d = d + 0.05 * jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos = jax.random.uniform(jax.random.fold_in(key, 3), (n, 3)) * 0.1 + 0.45
    w = jnp.ones((n,))
    leaf = jnp.zeros((n,), jnp.int32)
    return pos, d, w, leaf


def test_batch_em_concentrates_mass():
    L, K = 4, 8
    lo = jnp.zeros((L, 3))
    hi = jnp.ones((L, 3))
    sdmm = init_mod.init_leaf_params(jax.random.PRNGKey(0), lo, hi, K)
    pos, d, w, leaf = _two_cluster_samples(4096, jax.random.PRNGKey(1))
    active = jnp.zeros((L,), bool).at[0].set(True)
    out = em_mod.batch_em(sdmm, pos, d, w, leaf, active, n_iters=6)
    # Leaf 0 fitted; other leaves untouched.
    assert not np.allclose(np.asarray(out.mean[0]), np.asarray(sdmm.mean[0]))
    np.testing.assert_allclose(np.asarray(out.mean[1]), np.asarray(sdmm.mean[1]))
    # Mixture should place mass near both sample directions.
    mdirs = np.asarray(out.mean[0, :, 3:])
    wts = np.asarray(out.weight[0])
    near_z = wts[(mdirs @ np.array([0, 0, 1.0])) > 0.9].sum()
    near_x = wts[(mdirs @ np.array([1.0, 0, 0])) > 0.9].sum()
    assert near_z > 0.25 and near_x > 0.25, (near_z, near_x)


def test_kmeanspp_finds_clusters():
    key = jax.random.PRNGKey(2)
    # Two tight spatial clusters in leaf 0; one cluster in leaf 1.
    n = 512
    a = jnp.array([0.2, 0.2, 0.2]) + 0.02 * jax.random.normal(key, (n, 3))
    b = jnp.array([0.8, 0.8, 0.8]) + 0.02 * jax.random.normal(
        jax.random.fold_in(key, 1), (n, 3)
    )
    c = jnp.array([0.5, 0.1, 0.9]) + 0.02 * jax.random.normal(
        jax.random.fold_in(key, 2), (n, 3)
    )
    pos = jnp.concatenate([a, b, c])
    leaf = jnp.concatenate(
        [jnp.zeros(2 * n, jnp.int32), jnp.ones(n, jnp.int32)]
    )
    valid = jnp.ones((3 * n,), bool)
    centers, has = init_mod.kmeanspp_centers(
        jax.random.PRNGKey(5), pos, leaf, valid, n_leaves=4, n_centers=2
    )
    assert bool(has[0]) and bool(has[1]) and not bool(has[2])
    c0 = np.asarray(centers[0])
    # The two leaf-0 centers land in different clusters (k-means++ spread).
    d_a = np.linalg.norm(c0 - np.array([0.2, 0.2, 0.2]), axis=-1)
    d_b = np.linalg.norm(c0 - np.array([0.8, 0.8, 0.8]), axis=-1)
    assert (d_a < 0.15).any() and (d_b < 0.15).any(), c0
    c1 = np.asarray(centers[1])
    assert (np.linalg.norm(c1 - np.array([0.5, 0.1, 0.9]), axis=-1) < 0.15).all()


def test_uniform_grid_lookup_and_counts():
    g = UniformGrid(np.zeros(3), np.ones(3), resolution=8)
    t = g.device_tables()
    p = jnp.array([[0.01, 0.01, 0.01], [0.99, 0.99, 0.99], [0.5, 0.5, 0.5]])
    cells = np.asarray(grid_cell(t, p))
    assert cells[0] == 0
    assert cells[1] == 8 ** 3 - 1
    assert len(np.unique(cells)) == 3
    counts = cell_counts(t, p, jnp.ones(3, bool))
    assert float(counts.sum()) == 3.0
    dens = np.asarray(density_at(t, counts, p))
    assert (dens == 8 ** 3).all()  # 1 sample per cell / cell volume


def test_density_normalization_downweights_dense_regions():
    g = UniformGrid(np.zeros(3), np.ones(3), resolution=4)
    t = g.device_tables()
    key = jax.random.PRNGKey(7)
    # 1000 samples crowded into one cell + 10 spread out.
    dense = jnp.array([0.1, 0.1, 0.1]) + 0.01 * jax.random.uniform(key, (1000, 3))
    sparse = jax.random.uniform(jax.random.fold_in(key, 1), (10, 3)) * 0.5 + 0.45
    p = jnp.concatenate([dense, sparse])
    w = jnp.ones((1010,))
    valid = jnp.ones((1010,), bool)
    counts = cell_counts(t, p, valid)
    dens = density_at(t, counts, p)
    w2 = np.asarray(normalize_weights(w, dens, valid))
    assert w2[:1000].mean() < w2[1000:].mean()
    # Total weight roughly preserved in order of magnitude (clipped factors).
    assert 0.05 < w2.sum() / 1010 < 20.0


def test_trainer_data_init_smoke():
    import sys

    sys.path.insert(0, "tests")
    from test_render import make_box_scene

    from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig

    b = make_box_scene(24, 24)
    scene, cfg = b.build()
    cfg.max_depth = 4
    cfg.rr_depth = 4
    tc = TrainerConfig(
        samples_per_iteration=4, rays_per_wave=1152, max_leaves=64,
        split_threshold=5000, data_init=True, seed=3, train_fraction=1.0,
    )
    trainer = SDMMTrainer(scene, cfg, tc)
    img, _ = trainer.run(total_spp=8)
    assert np.isfinite(img).all()
    assert int(trainer.initialized.sum()) > 0
