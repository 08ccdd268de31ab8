"""Bounding-volume hierarchy: host median-split build + device threaded
traversal.

TPU-native replacement for the reference's SAH kd-tree
(reference: mitsuba/include/mitsuba/render/gkdtree.h, sahkdtree3.h,
skdtree.h — the per-ray hot path). Irregular pointer-chasing traversal is
hostile to TPU vector units, so the tree is *threaded*: nodes are laid out
in depth-first order and each carries a ``miss`` link (escape pointer).
Traversal is then a single stackless ``while_loop`` where every ray holds
one node pointer — all memory access is dense gathers, no per-ray stack.

Triangles are permuted into leaf-contiguous order at build time so leaf
tests are aligned vector loads of ``LEAF_SIZE`` consecutive triangles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
INF = jnp.float32(3.4e38)
EPS = 1e-6


def build_bvh(verts: np.ndarray, leaf_size: int = LEAF_SIZE):
    """Median-split BVH.

    verts: [T, 3, 3] triangle vertices. Returns dict of numpy arrays:
    lo/hi [M,3], leaf_start [M] (−1 internal), leaf_count [M], miss [M],
    perm [T'] (triangle permutation, padded to leaf multiples with -1).

    Large meshes route through the native C++ builder when available
    (sdmm_tpu/native.py); the numpy path below is the fallback + oracle.
    """
    t = len(verts)
    if t > 20000:
        from ..native import bvh_build_native

        out = bvh_build_native(np.asarray(verts, np.float32), leaf_size)
        if out is not None:
            return out
    if t == 0:
        return {
            "lo": np.zeros((1, 3), np.float32),
            "hi": np.zeros((1, 3), np.float32),
            "leaf_start": np.zeros(1, np.int32),
            "leaf_count": np.zeros(1, np.int32),
            "miss": np.full(1, -1, np.int32),
            "perm": np.zeros(0, np.int32),
        }
    centroids = verts.mean(axis=1)
    tri_lo = verts.min(axis=1)
    tri_hi = verts.max(axis=1)

    lo_l, hi_l, leaf_start_l, leaf_count_l, end_l = [], [], [], [], []
    perm: list[int] = []

    # Iterative depth-first build (explicit stack → no recursion limits).
    stack = [(np.arange(t), None)]
    while stack:
        idx, parent_done = stack.pop()
        if idx is None:
            # Marker: record subtree end for node `parent_done`.
            end_l[parent_done] = len(lo_l)
            continue
        node = len(lo_l)
        lo_l.append(tri_lo[idx].min(axis=0))
        hi_l.append(tri_hi[idx].max(axis=0))
        leaf_start_l.append(-1)
        leaf_count_l.append(0)
        end_l.append(-1)
        if len(idx) <= leaf_size:
            start = len(perm)
            perm.extend(idx.tolist())
            while len(perm) % leaf_size:  # pad leaf for aligned loads
                perm.append(-1)
            leaf_start_l[node] = start
            leaf_count_l[node] = len(idx)
            end_l[node] = node + 1
            continue
        ext = hi_l[node] - lo_l[node]
        axis = int(np.argmax(ext))
        order = idx[np.argsort(centroids[idx, axis], kind="stable")]
        half = len(order) // 2
        # Push: end-marker, right, left (processed in reverse).
        stack.append((None, node))
        stack.append((order[half:], None))
        stack.append((order[:half], None))

    m = len(lo_l)
    # Miss links: depth-first layout → internal hit-link = node+1;
    # right sibling = end of left subtree; escape = parent's escape.
    miss = np.full(m, -1, np.int32)
    st = [(0, -1)]
    while st:
        node, escape = st.pop()
        miss[node] = escape
        if leaf_start_l[node] < 0:
            left = node + 1
            right = end_l[left]
            st.append((left, right))
            st.append((right, escape))

    return {
        "lo": np.asarray(lo_l, np.float32),
        "hi": np.asarray(hi_l, np.float32),
        "leaf_start": np.asarray(leaf_start_l, np.int32),
        "leaf_count": np.asarray(leaf_count_l, np.int32),
        "miss": miss,
        "perm": np.asarray(perm, np.int32),
    }


@partial(jax.jit, static_argnames=("any_hit",))
def traverse(scene, ro, rd, t_max=None, any_hit: bool = False):
    """Threaded-BVH closest-hit (or any-hit) traversal.

    Uses scene.bvh_* arrays and the leaf-ordered triangle copies
    scene.btri_v0/e1/e2 with scene.btri_orig mapping to original ids.
    """
    n = ro.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), INF)
    safe_d = jnp.where(jnp.abs(rd) > 1e-12, rd, jnp.where(rd >= 0, 1e-12, -1e-12))
    inv_d = 1.0 / safe_d

    lo = scene.bvh_lo
    hi = scene.bvh_hi
    leaf_start = scene.bvh_leaf_start
    leaf_count = scene.bvh_leaf_count
    miss_link = scene.bvh_miss

    def cond(state):
        node, best_t, best_i, best_u, best_v, occ = state
        live = node >= 0
        if any_hit:
            live = live & ~occ
        return jnp.any(live)

    def step(state):
        node, best_t, best_i, best_u, best_v, occ = state
        nid = jnp.maximum(node, 0)
        nlo = lo[nid]
        nhi = hi[nid]
        # Slab test.
        t0 = (nlo - ro) * inv_d
        t1 = (nhi - ro) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit_box = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < jnp.minimum(best_t, t_max))

        is_leaf = leaf_start[nid] >= 0
        do_leaf = hit_box & is_leaf & (node >= 0)

        # Test LEAF_SIZE triangles (padded slots carry degenerate data).
        start = jnp.where(do_leaf, leaf_start[nid], 0)
        offs = jnp.arange(LEAF_SIZE, dtype=jnp.int32)
        tid = start[:, None] + offs[None, :]
        in_leaf = offs[None, :] < jnp.where(do_leaf, leaf_count[nid], 0)[:, None]
        v0 = scene.btri_v0[tid]
        e1 = scene.btri_e1[tid]
        e2 = scene.btri_e2[tid]
        pvec = jnp.cross(rd[:, None, :], e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = ro[:, None, :] - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(rd[:, None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        tri_hit = (
            in_leaf
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > EPS)
            & (t < jnp.minimum(best_t, t_max)[:, None])
        )
        t = jnp.where(tri_hit, t, INF)
        arg = jnp.argmin(t, axis=-1)
        cand_t = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        cand_i = jnp.take_along_axis(tid, arg[:, None], axis=-1)[:, 0]
        cand_u = jnp.take_along_axis(u, arg[:, None], axis=-1)[:, 0]
        cand_v = jnp.take_along_axis(v, arg[:, None], axis=-1)[:, 0]
        better = do_leaf & (cand_t < best_t)
        best_t = jnp.where(better, cand_t, best_t)
        best_i = jnp.where(better, cand_i, best_i)
        best_u = jnp.where(better, cand_u, best_u)
        best_v = jnp.where(better, cand_v, best_v)
        occ = occ | (better if any_hit else jnp.zeros_like(occ))

        # Advance: internal hit → enter (node+1); else → miss link.
        enter = hit_box & ~is_leaf
        nxt = jnp.where(enter, nid + 1, miss_link[nid])
        node = jnp.where(node >= 0, nxt, node)
        return (node, best_t, best_i, best_u, best_v, occ)

    init = (
        jnp.zeros(n, jnp.int32),
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros(n),
        jnp.zeros(n),
        jnp.zeros(n, bool),
    )
    node, best_t, best_i, best_u, best_v, occ = jax.lax.while_loop(cond, step, init)
    if any_hit:
        return occ
    tri = jnp.where(best_i >= 0, scene.btri_orig[jnp.maximum(best_i, 0)], -1)
    return {
        "t": best_t,
        "tri": tri,
        "u": best_u,
        "v": best_v,
        "valid": tri >= 0,
    }
