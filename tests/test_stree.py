import jax.numpy as jnp
import numpy as np

from sdmm_tpu.guiding.stree import STree, find_leaf, find_leaf_with_bounds


def test_split_to_depth():
    t = STree(np.zeros(3), np.ones(3))
    t.split_to_depth(2)
    assert t.n_leaves == 4
    tables = t.device_tables()
    p = jnp.asarray(np.random.RandomState(0).rand(256, 3), dtype=jnp.float32)
    leaf, lo, hi = find_leaf_with_bounds(tables, p)
    # Every point lands in a leaf whose bounds contain it.
    assert np.all(np.asarray(leaf) >= 0) and np.all(np.asarray(leaf) < 4)
    assert np.all(np.asarray(p) >= np.asarray(lo) - 1e-6)
    assert np.all(np.asarray(p) <= np.asarray(hi) + 1e-6)


def test_refit_splits_hot_leaf():
    t = STree(np.zeros(3), np.ones(3), split_threshold=100)
    t.split_to_depth(1)
    assert t.n_leaves == 2
    counts = np.zeros(t.max_leaves)
    counts[0] = 1000  # hot leaf: should split recursively (1000→500→250→125)
    copies = t.refit(counts[: t.n_leaves])
    assert t.n_leaves > 4
    assert len(copies) == t.n_leaves - 2
    # Copy targets are fresh slots.
    dsts = [d for d, s in copies]
    assert len(set(dsts)) == len(dsts)
    # Device table is consistent after refit.
    tables = t.device_tables()
    p = jnp.asarray(np.random.RandomState(1).rand(512, 3), dtype=jnp.float32)
    leaf = find_leaf(tables, p)
    assert np.all(np.asarray(leaf) >= 0)
    assert np.all(np.asarray(leaf) < t.n_leaves)


def test_max_leaves_respected():
    t = STree(np.zeros(3), np.ones(3), max_leaves=8, split_threshold=1)
    t.split_to_depth(1)
    t.refit(np.full(t.n_leaves, 1e9))
    assert t.n_leaves <= 8


def test_grid_lookup_matches_descent():
    """The dense dyadic grid must agree with the node-table descent
    (the grid is the fast path; the descent is the semantic spec)."""
    from sdmm_tpu.guiding.stree import _find_leaf_descent

    rs = np.random.RandomState(7)
    t = STree(-1e-5 * np.ones(3), np.array([1.0, 0.8, 0.6]) + 1e-5,
              split_threshold=50)
    t.split_to_depth(2)
    # Drive an uneven refinement: hammer a corner leaf repeatedly.
    for _ in range(6):
        tables = t.device_tables()
        pts = rs.rand(4096, 3).astype(np.float32) ** 2 * [1.0, 0.8, 0.6]
        leaf = np.asarray(find_leaf(tables, jnp.asarray(pts)))
        counts = np.zeros(t.max_leaves)
        np.add.at(counts, leaf, 1.0)
        t.refit(counts * 30.0)
    tables = t.device_tables()
    assert "grid" in tables
    pts = jnp.asarray(rs.rand(8192, 3).astype(np.float32) * [1.0, 0.8, 0.6])
    fast = np.asarray(find_leaf(tables, pts))
    slow = np.asarray(_find_leaf_descent(tables, pts))
    assert np.mean(fast == slow) > 0.999  # boundary-ulp mismatches only
    assert np.array_equal(np.sort(np.unique(fast)), np.sort(np.unique(slow)))


def test_grid_cap_falls_back_to_descent(monkeypatch):
    """When the dense grid would exceed the cell cap (deep trees), the
    tables must omit the grid entirely so find_leaf uses the exact
    descent — never a silently-approximate shared-cell grid."""
    from sdmm_tpu.guiding.stree import _find_leaf_descent

    monkeypatch.setattr(STree, "_GRID_CELL_CAP", 1 << 9)
    t = STree(np.zeros(3), np.ones(3), split_threshold=1)
    # Recursive refit splits the hot leaf far past 2^9 total cells.
    t.split_to_depth(2)
    counts = np.zeros(t.max_leaves)
    counts[0] = 1 << 14
    t.refit(counts[: t.n_leaves])
    assert max(t.depth) > 9  # deep enough that prod(res) > 2^9
    tables = t.device_tables()
    assert "grid" not in tables
    pts = jnp.asarray(np.random.RandomState(3).rand(4096, 3), jnp.float32)
    fast = np.asarray(find_leaf(tables, pts))
    slow = np.asarray(_find_leaf_descent(tables, pts))
    assert np.array_equal(fast, slow)  # exact: same code path
    # Every point is inside its reported leaf bounds.
    lo = np.asarray(tables["leaf_lo"])[fast]
    hi = np.asarray(tables["leaf_hi"])[fast]
    p = np.asarray(pts)
    assert (p >= lo - 1e-6).all() and (p <= hi + 1e-6).all()
