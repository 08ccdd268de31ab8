"""Prioritized-replay sample reservoir tests (reference: jmm/samples.h
decayed replay :355-391 and russianRoulette :392-432 — RR keeps the
weight-sum estimator unbiased)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.guiding.reservoir import make_reservoir, reservoir_update


def _batch(n, key, w_scale=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (n, 3))
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wgt = jax.random.uniform(k3, (n,)) * w_scale
    valid = jnp.ones((n,), dtype=bool)
    return pos, d, wgt, valid


def test_under_capacity_keeps_everything():
    res = make_reservoir(1024)
    pos, d, wgt, valid = _batch(100, jax.random.PRNGKey(0))
    res = reservoir_update(res, pos, d, wgt, valid, jax.random.PRNGKey(1), 1024)
    assert int(res["valid"].sum()) == 100
    # Weights unchanged (survival prob 1 under capacity).
    np.testing.assert_allclose(
        np.sort(np.asarray(res["weight"][res["valid"]])),
        np.sort(np.asarray(wgt)), rtol=1e-5,
    )


def test_rr_downsampling_unbiased():
    cap = 512
    res = make_reservoir(cap)
    total_in = 0.0
    kept_sums = []
    for trial in range(20):
        r = make_reservoir(cap)
        pos, d, wgt, valid = _batch(2048, jax.random.PRNGKey(trial))
        r = reservoir_update(r, pos, d, wgt, valid,
                             jax.random.fold_in(jax.random.PRNGKey(99), trial), cap)
        assert int(r["valid"].sum()) <= cap
        kept_sums.append(float(jnp.where(r["valid"], r["weight"], 0.0).sum()))
        total_in += float(wgt.sum())
    # E[sum of corrected weights] == sum of input weights.
    assert abs(np.mean(kept_sums) - total_in / 20) / (total_in / 20) < 0.05


def test_decay_ages_out_old_samples():
    cap = 256
    res = make_reservoir(cap)
    pos, d, wgt, valid = _batch(256, jax.random.PRNGKey(0), w_scale=1.0)
    res = reservoir_update(res, pos, d, wgt, valid, jax.random.PRNGKey(1), cap,
                           decay=0.25)
    old_pr = float(res["priority"][res["valid"]].mean())
    # Push a big fresh batch; old entries decay to priority/4 and lose RR.
    pos2, d2, wgt2, valid2 = _batch(2048, jax.random.PRNGKey(2), w_scale=1.0)
    res2 = reservoir_update(res, pos2, d2, wgt2, valid2, jax.random.PRNGKey(3),
                            cap, decay=0.25)
    assert int(res2["valid"].sum()) <= cap
    # Survivor pool dominated by fresh samples: priorities near fresh scale.
    assert float(res2["priority"][res2["valid"]].mean()) > 0.25 * old_pr


def test_trainer_with_reservoir_smoke():
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
        split_threshold=5000, reservoir_capacity=8192, seed=7,
        train_fraction=1.0,
    )
    trainer = SDMMTrainer(scene, cfg, tc)
    img, iters = trainer.run(total_spp=16)
    assert np.isfinite(img).all()
    assert int(trainer.initialized.sum()) > 0
    assert int(trainer.reservoir["valid"].sum()) > 0


def test_lookup_pos_carried_through_merge():
    """Jitter replicas keep their destination leaf: the lookup position
    (jittered) must survive the merge separately from the EM position
    (original), so find_leaf(lookup) routes the replica to the
    neighboring leaf, not back to the source leaf."""
    import numpy as np

    cap = 64
    res = make_reservoir(cap)
    pos = jnp.full((8, 3), 0.25)
    look = jnp.full((8, 3), 0.75)  # "jittered into the other leaf"
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    wgt = jnp.ones(8)
    valid = jnp.ones(8, dtype=bool)
    res = reservoir_update(res, pos, d, wgt, valid, jax.random.PRNGKey(0),
                           cap, lookup_pos=look)
    kept = np.asarray(res["valid"])
    assert kept.sum() == 8
    np.testing.assert_allclose(np.asarray(res["pos"])[kept], 0.25)
    np.testing.assert_allclose(np.asarray(res["lookup_pos"])[kept], 0.75)
    # Default: lookup_pos follows pos.
    res2 = reservoir_update(res, pos, d, wgt, valid, jax.random.PRNGKey(1),
                            cap)
    kept2 = np.asarray(res2["valid"])
    both = np.asarray(res2["lookup_pos"])[kept2]
    assert ((np.isclose(both, 0.75) | np.isclose(both, 0.25)).all())
