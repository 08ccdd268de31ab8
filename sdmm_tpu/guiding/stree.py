"""Adaptive binary spatial tree over the canonical scene domain.

TPU-native equivalent of ``sdmm::accelerators::STree``
(reference API: SURVEY.md §2.3; usage volpath_sdmm.cpp:392-398 ctor +
split_to_depth(2), :182-189 split_leaf_recurse(threshold=4000), ≤2048
leaves; device-side find at sdmm_proc.cpp:314). Tree *construction* is tiny
(≤2048 leaves) and runs on host in numpy between iterations; the per-ray
``find`` is a vectorized descent over a flat node table on device
(`lax.fori_loop`), replacing the reference's pointer-chasing 5.2%-of-runtime
hotspot with a gather pipeline.

Leaves are slots into the ``[L, K]`` mixture arrays. On split, one child
keeps the parent's slot and the sibling gets a fresh slot; the trainer
copies mixture state to the new slot (the reference's children likewise see
the parent's fitted mixture).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_TREE_DEPTH = 24


class STree:
    def __init__(self, lo, hi, max_leaves: int = 2048, split_threshold: int = 4000):
        self.lo = np.asarray(lo, dtype=np.float64)
        self.hi = np.asarray(hi, dtype=np.float64)
        self.max_leaves = max_leaves
        self.split_threshold = split_threshold
        # Flat node arrays.
        self.axis = [0]
        self.split = [0.0]
        self.child = [-1]  # left child index; right = left + 1; -1 = leaf
        self.leaf = [0]  # leaf slot (-1 for internal nodes)
        self.depth = [0]
        self.node_lo = [self.lo.copy()]
        self.node_hi = [self.hi.copy()]
        self.n_leaves = 1
        self.leaf_counts = np.zeros(max_leaves, dtype=np.float64)
        # Copies performed at the last refit: list of (dst_slot, src_slot).
        self.pending_copies: list[tuple[int, int]] = []

    # -- construction -------------------------------------------------------

    def _split_node(self, i: int) -> bool:
        """Split leaf node i; returns False if out of leaf slots."""
        if self.n_leaves >= self.max_leaves:
            return False
        lo, hi = self.node_lo[i], self.node_hi[i]
        ext = hi - lo
        axis = int(np.argmax(ext))
        split = 0.5 * (lo[axis] + hi[axis])
        slot = self.leaf[i]
        left = len(self.axis)
        for side in range(2):
            c_lo, c_hi = lo.copy(), hi.copy()
            if side == 0:
                c_hi[axis] = split
            else:
                c_lo[axis] = split
            self.axis.append(0)
            self.split.append(0.0)
            self.child.append(-1)
            self.depth.append(self.depth[i] + 1)
            self.node_lo.append(c_lo)
            self.node_hi.append(c_hi)
            if side == 0:
                self.leaf.append(slot)
            else:
                new_slot = self.n_leaves
                self.leaf.append(new_slot)
                self.pending_copies.append((new_slot, slot))
                # Child inherits half the parent's accumulated count.
                self.leaf_counts[new_slot] = 0.0
        self.n_leaves += 1
        half = self.leaf_counts[slot] * 0.5
        self.leaf_counts[slot] = half
        self.leaf_counts[self.leaf[left + 1]] = half
        self.axis[i] = axis
        self.split[i] = split
        self.child[i] = left
        self.leaf[i] = -1
        return True

    def split_to_depth(self, depth: int):
        """Pre-split uniformly (reference: split_to_depth(2))."""
        changed = True
        while changed:
            changed = False
            for i in range(len(self.axis)):
                if self.child[i] < 0 and self.depth[i] < depth:
                    if self._split_node(i):
                        changed = True

    def refit(self, new_counts: np.ndarray):
        """Accumulate counts and split leaves over threshold
        (reference: split_leaf_recurse, volpath_sdmm.cpp:184)."""
        self.pending_copies = []
        self.leaf_counts[: len(new_counts)] += np.asarray(new_counts, dtype=np.float64)
        changed = True
        while changed and self.n_leaves < self.max_leaves:
            changed = False
            for i in range(len(self.axis)):
                if (
                    self.child[i] < 0
                    and self.depth[i] < MAX_TREE_DEPTH
                    and self.leaf_counts[self.leaf[i]] >= self.split_threshold
                ):
                    if self._split_node(i):
                        changed = True
                    else:
                        break
        return list(self.pending_copies)

    # -- device tables ------------------------------------------------------

    def device_tables(self) -> dict:
        leaf_lo = np.zeros((self.max_leaves, 3))
        leaf_hi = np.ones((self.max_leaves, 3))
        for i in range(len(self.axis)):
            if self.child[i] < 0:
                leaf_lo[self.leaf[i]] = self.node_lo[i]
                leaf_hi[self.leaf[i]] = self.node_hi[i]
        grid, res = self._leaf_grid()
        # STATIC SHAPES: every jitted consumer of the tables (the guided
        # render pools, find_leaf, the EM prep) retraces when an array
        # SHAPE changes. The tree refit grows the node arrays and the
        # dyadic grid every training iteration; unpadded, that recompiled
        # the entire guided pipeline per iteration (measured 15-25 s of
        # XLA compile per 4-spp iteration on a cold cache). Node arrays
        # pad to the 2·max_leaves bound (a binary tree with L leaves has
        # 2L-1 nodes); the flat grid pads to power-of-4 buckets (the
        # linear index never exceeds prod(res), so tail cells are inert)
        # — at most ~6 retraces over a whole run instead of one per refit.
        n_nodes_max = 2 * self.max_leaves
        pad_n = max(0, n_nodes_max - len(self.axis))

        def pad_i32(a, fill):
            return jnp.asarray(
                np.pad(np.asarray(a, np.int32), (0, pad_n),
                       constant_values=fill), dtype=jnp.int32)

        tables = {
            "axis": pad_i32(self.axis, 0),
            "split": jnp.asarray(
                np.pad(np.asarray(self.split, np.float32), (0, pad_n)),
                dtype=jnp.float32),
            "child": pad_i32(self.child, -1),
            "leaf": pad_i32(self.leaf, 0),
            "leaf_lo": jnp.asarray(leaf_lo, dtype=jnp.float32),
            "leaf_hi": jnp.asarray(leaf_hi, dtype=jnp.float32),
        }
        if grid is not None:
            # Dense dyadic lookup grid: find = ONE element gather instead of
            # a MAX_TREE_DEPTH-level descent (~96 gathers; measured 40 ms →
            # ~2 ms for a 131k-ray wave). All split planes are dyadic
            # midpoints, so with per-axis resolution = 2^(max splits along
            # that axis) every leaf tiles an exact integer box of cells.
            flat = grid.reshape(-1)
            cap = 1 << 20  # 4 MB i32: one shape covers nearly every run
            while cap < flat.size:
                cap *= 4
            tables["grid"] = jnp.asarray(
                np.pad(flat, (0, cap - flat.size)), dtype=jnp.int32)
            tables["grid_lo"] = jnp.asarray(self.lo, dtype=jnp.float32)
            tables["grid_scale"] = jnp.asarray(
                np.asarray(res, np.float64) / (self.hi - self.lo),
                dtype=jnp.float32,
            )
            tables["grid_res"] = jnp.asarray(res, dtype=jnp.int32)
        return tables

    _GRID_CELL_CAP = 1 << 24  # 16M cells = 64 MB i32 upper bound

    def _leaf_grid(self):
        """Box-fill leaf slots into a dense [R0, R1, R2] grid.

        Per-axis resolution is the finest split level present, so every
        leaf tiles an exact integer box of cells. If the total cell count
        would exceed the cap (possible only if MAX_TREE_DEPTH or the cap
        constant change: prod(res) ≤ 2^MAX_TREE_DEPTH), returns (None,
        None) and ``find_leaf`` falls back to the exact node-table descent
        rather than silently misrouting samples near fine leaves.
        """
        ext = self.hi - self.lo
        res = np.ones(3, dtype=np.int64)
        leaves = [i for i in range(len(self.axis)) if self.child[i] < 0]
        for i in leaves:
            for a in range(3):
                leaf_ext = self.node_hi[i][a] - self.node_lo[i][a]
                k = int(round(np.log2(max(ext[a] / max(leaf_ext, 1e-12), 1.0))))
                res[a] = max(res[a], 1 << k)
        if int(np.prod(res)) > self._GRID_CELL_CAP:
            return None, None
        grid = np.zeros(tuple(int(r) for r in res), dtype=np.int32)
        for i in leaves:
            i_lo = np.floor((self.node_lo[i] - self.lo) / ext * res + 0.5).astype(int)
            i_hi = np.floor((self.node_hi[i] - self.lo) / ext * res + 0.5).astype(int)
            assert (i_hi > i_lo).all(), (
                "leaf does not cover a full grid cell — resolution "
                "derivation is inconsistent with the split planes"
            )
            grid[i_lo[0]:i_hi[0], i_lo[1]:i_hi[1], i_lo[2]:i_hi[2]] = self.leaf[i]
        return grid, res


@jax.jit
def find_leaf(tables: dict, p: jnp.ndarray) -> jnp.ndarray:
    """Canonical positions [N, 3] → leaf slots [N].

    Uses the dense dyadic grid (one element gather) when present; falls
    back to the vectorized node-table descent (reference semantics:
    sdmm::accelerators::STree::find, sdmm_proc.cpp:314)."""
    if "grid" in tables:
        res = tables["grid_res"]
        c = ((p - tables["grid_lo"]) * tables["grid_scale"]).astype(jnp.int32)
        c = jnp.clip(c, 0, res - 1)
        lin = (c[..., 0] * res[1] + c[..., 1]) * res[2] + c[..., 2]
        return tables["grid"][lin]
    return _find_leaf_descent(tables, p)


@jax.jit
def _find_leaf_descent(tables: dict, p: jnp.ndarray) -> jnp.ndarray:
    """Vectorized tree descent: canonical positions [N, 3] → leaf slots [N]."""
    n = p.shape[0]

    def body(_, node):
        child = tables["child"][node]
        axis = tables["axis"][node]
        split = tables["split"][node]
        px = jnp.take_along_axis(p, axis[:, None], axis=1)[:, 0]
        nxt = child + (px > split).astype(jnp.int32)
        return jnp.where(child < 0, node, nxt)

    node = jax.lax.fori_loop(0, MAX_TREE_DEPTH, body, jnp.zeros(n, dtype=jnp.int32))
    return tables["leaf"][node]


@jax.jit
def find_leaf_with_bounds(tables: dict, p: jnp.ndarray):
    leaf = find_leaf(tables, p)
    return leaf, tables["leaf_lo"][leaf], tables["leaf_hi"][leaf]
