"""Cluster sweep: TPU-shaped ray-scene intersection for large meshes.

Replaces pointer-style BVH traversal (render/bvh.py) on the hot path.
The threaded BVH walks one node per while-iteration; on TPU every
iteration pays a serial row-gather latency (~25 ns/ray), and rays visit
~160 nodes per bounce — orders of magnitude slower than the dense sweep
on small scenes (PERF.md). This module restructures intersection around
what the hardware is good at:

 1. Triangles are Morton-sorted and grouped into C ≤ 2048 fixed-size
    clusters (host build). Cluster AABBs live in [C,3] arrays; cluster
    triangles in ONE wide row each ([C, 9·Tc] component-major layout) —
    a single ~21 ns row gather fetches a whole cluster.
 2. Per bounce, every ray finds its next-nearest unprocessed cluster by
    a fused reduction over all C clusters — recomputed each round, never
    materialized. Selection without sort: the slab-entry distance and the
    cluster id are packed into one monotone int32 key (IEEE-754 bitcast
    of a non-negative float is order-preserving; the low ID_BITS carry
    the id, truncating the mantissa conservatively DOWNWARD so the
    termination test stays safe).
 3. The ray tests the selected cluster's Tc triangles densely
    (component-scalarized Möller–Trumbore, as intersect._mt_chunk) and
    loops until its next-nearest entry distance exceeds its best hit.

Reference equivalent: mitsuba/include/mitsuba/render/{gkdtree.h,
sahkdtree3.h,triaccel.h} (SAH kd-tree + packet traversal) — re-designed
rather than ported, per the TPU gather/latency model measured in PERF.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(3.4e38)
EPS = 1e-6
ID_BITS = 11  # supports C ≤ 2048 clusters
ID_MASK = (1 << ID_BITS) - 1
KEY_MISS = np.int32(2**31 - 1)
MAX_CLUSTERS = 1 << ID_BITS


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized coords into 30-bit Morton codes."""
    q = np.clip((x * 1024.0).astype(np.uint32), 0, 1023).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def build_clusters(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                   t_c: int | None = None) -> dict:
    """Host-side cluster build over original-order triangles.

    Returns numpy dict: lo/hi [C,3], rows [C, 9*t_c] (component-major:
    t_c of v0x, then v0y, … e2z), ids [C, t_c] int32 (-1 padding), t_c.
    """
    t = v0.shape[0]
    if t == 0:
        return {
            "lo": np.zeros((1, 3), np.float32),
            "hi": np.zeros((1, 3), np.float32),
            "rows": np.zeros((1, 9), np.float32),
            "ids": np.full((1, 1), -1, np.int32),
            "t_c": 1,
            "woop": np.zeros((1, 12, 1), np.float32),
            "aabb": np.full((8, 128), 3.4e38, np.float32),
        }
    if t_c is None:
        # 256 measured best on v5e: gather rows stay ~9 KB (latency-bound,
        # ~40 ns) while the per-round [N,C] slab sweep shrinks 4× vs t_c=64.
        t_c = 256
        while (t + t_c - 1) // t_c > MAX_CLUSTERS:
            t_c *= 2
    cen = v0 + (e1 + e2) / 3.0
    lo_s = cen.min(0)
    ext = np.maximum(cen.max(0) - lo_s, 1e-9)
    order = np.argsort(_morton3((cen - lo_s) / ext), kind="stable")
    order = order.astype(np.int32)

    c = (t + t_c - 1) // t_c
    pad = c * t_c - t
    idx = np.concatenate([order, np.full(pad, -1, np.int32)]).reshape(c, t_c)

    sv0 = np.zeros((c, t_c, 3), np.float32)
    se1 = np.zeros((c, t_c, 3), np.float32)
    se2 = np.zeros((c, t_c, 3), np.float32)
    valid = idx >= 0
    sv0[valid] = v0[idx[valid]]
    se1[valid] = e1[idx[valid]]
    se2[valid] = e2[idx[valid]]

    p0 = sv0
    p1 = sv0 + se1
    p2 = sv0 + se2
    tl = np.minimum(np.minimum(p0, p1), p2)
    th = np.maximum(np.maximum(p0, p1), p2)
    big = np.float32(3.4e38)
    tl = np.where(valid[..., None], tl, big)
    th = np.where(valid[..., None], th, -big)
    lo = tl.min(axis=1)
    hi = th.max(axis=1)

    # Component-major row: [v0x…, v0y…, v0z…, e1x…, …, e2z…].
    rows = np.concatenate(
        [sv0[:, :, 0], sv0[:, :, 1], sv0[:, :, 2],
         se1[:, :, 0], se1[:, :, 1], se1[:, :, 2],
         se2[:, :, 0], se2[:, :, 1], se2[:, :, 2]], axis=1,
    ).astype(np.float32)
    from ..ops.clas_pallas import build_woop_rows

    woop, aabb = build_woop_rows(
        lo.astype(np.float32), hi.astype(np.float32), rows, int(t_c))
    return {"lo": lo.astype(np.float32), "hi": hi.astype(np.float32),
            "rows": rows, "ids": idx, "t_c": int(t_c),
            "woop": woop, "aabb": aabb}


def _round_key(scene, ro, rd, inv_d, limit_t, prev_key):
    """Fused selection: min over clusters of the (entry-t, id) key, among
    keys strictly greater than prev_key and entries closer than limit_t.
    Every intermediate is [N, C] scalar-broadcast (no [N,C,3])."""
    lo = scene.clas_lo
    hi = scene.clas_hi
    rox, roy, roz = (ro[:, i:i + 1] for i in range(3))
    ix, iy, iz = (inv_d[:, i:i + 1] for i in range(3))
    lx, ly, lz = (lo[None, :, i] for i in range(3))
    hx, hy, hz = (hi[None, :, i] for i in range(3))
    ax0 = (lx - rox) * ix
    ax1 = (hx - rox) * ix
    ay0 = (ly - roy) * iy
    ay1 = (hy - roy) * iy
    az0 = (lz - roz) * iz
    az1 = (hz - roz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(ax0, ax1), jnp.minimum(ay0, ay1)),
        jnp.minimum(az0, az1),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
        jnp.maximum(az0, az1),
    )
    tent = jnp.maximum(tmin, 0.0)
    hit = (tmax >= tent) & (tmin < limit_t[:, None])
    cid = jnp.arange(lo.shape[0], dtype=jnp.int32)[None, :]
    key = (jax.lax.bitcast_convert_type(tent, jnp.int32)
           & jnp.int32(~ID_MASK)) | cid
    key = jnp.where(hit, key, KEY_MISS)
    key = jnp.where(key > prev_key[:, None], key, KEY_MISS)
    return jnp.min(key, axis=1)


def _key_entry_t(key):
    """Conservative (≤ true) entry distance decoded from a key."""
    return jax.lax.bitcast_convert_type(key & jnp.int32(~ID_MASK), jnp.float32)


def _test_cluster(scene, ro, rd, cluster, t_lim, t_c: int):
    """Dense MT test of each ray's selected cluster (one wide row gather)."""
    row = scene.clas_rows[cluster]  # [N, 9*t_c]

    def comp(k):
        return row[:, k * t_c:(k + 1) * t_c]  # [N, t_c]

    v0x, v0y, v0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
    rox, roy, roz = (ro[:, i:i + 1] for i in range(3))
    rdx, rdy, rdz = (rd[:, i:i + 1] for i in range(3))

    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = rox - v0x
    ty = roy - v0y
    tz = roz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > EPS) & (t < t_lim[:, None])
    )
    t = jnp.where(hit, t, INF)
    arg = jnp.argmin(t, axis=-1)
    take = lambda a: jnp.take_along_axis(a, arg[:, None], axis=-1)[:, 0]  # noqa: E731
    slot = jnp.take_along_axis(scene.clas_ids[cluster], arg[:, None], -1)[:, 0]
    return take(t), slot, take(u), take(v)


def _sweep_body(scene, ro, rd, inv_d, t_max, t_c, c):
    """One selection + cluster-test round over the given ray arrays."""
    active, prev_key, best_t, best_i, best_u, best_v = c
    limit = jnp.minimum(best_t, t_max)
    key = _round_key(scene, ro, rd, inv_d, limit, prev_key)
    act = active & (key != KEY_MISS)
    cluster = jnp.where(act, key & ID_MASK, 0)
    ct, ci, cu, cv = _test_cluster(scene, ro, rd, cluster, limit, t_c)
    better = act & (ci >= 0) & (ct < best_t)
    best_t = jnp.where(better, ct, best_t)
    best_i = jnp.where(better, ci, best_i)
    best_u = jnp.where(better, cu, best_u)
    best_v = jnp.where(better, cv, best_v)
    # Continue while an unprocessed cluster could still beat best_t.
    return (act, jnp.where(act, key, prev_key),
            best_t, best_i, best_u, best_v)


PHASE_A_ROUNDS = 6  # full-width rounds before tail compaction


@jax.jit
def intersect(scene, ro, rd, t_max=None):
    """Closest hit via the round loop. Same record as intersect.intersect.

    Two-phase schedule: a few full-width rounds retire the common case
    (most rays visit O(5) clusters), then the ACTIVE TAIL is compacted
    into an n/4 workspace and swept there — the while-loop no longer
    drags every finished ray through [N,C] slab sweeps and 9 KB cluster
    row gathers for the slowest ray's 25+ rounds (the r3 0.13 Mrays/s
    profile). Overflow-safe: if more than n/4 rays are still active the
    outer loop simply compacts again."""
    n = ro.shape[0]
    t_c = scene.clas_ids.shape[1]
    if t_max is None:
        t_max = jnp.full((n,), INF)
    safe_d = jnp.where(jnp.abs(rd) > 1e-12,
                       rd, jnp.where(rd >= 0, 1e-12, -1e-12))
    inv_d = 1.0 / safe_d

    init = (
        jnp.ones(n, bool),
        jnp.full((n,), jnp.int32(-2**31)),
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros(n),
        jnp.zeros(n),
    )

    # Phase A: fixed number of full-width rounds.
    c = jax.lax.fori_loop(
        0, PHASE_A_ROUNDS,
        lambda _, c: _sweep_body(scene, ro, rd, inv_d, t_max, t_c, c),
        init,
    )

    cap = max(1024, n // 4)
    if cap >= n:
        # Tiny waves: finish with the plain while loop.
        def cond(c):
            return jnp.any(c[0])

        c = jax.lax.while_loop(
            cond, lambda c: _sweep_body(scene, ro, rd, inv_d, t_max, t_c, c),
            c)
        _, _, t, tri, u, v = c
        return {"t": t, "tri": tri, "u": u, "v": v, "valid": tri >= 0}

    # Phase B: compacted tail sweeps.
    K_INNER = 4

    def outer_cond(c):
        return jnp.any(c[0])

    def outer_body(c):
        active, prev_key, best_t, best_i, best_u, best_v = c
        rank = jnp.cumsum(active.astype(jnp.int32)) - 1
        idx = jnp.where(active & (rank < cap), rank, cap)
        src = jnp.zeros((cap,), jnp.int32).at[idx].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        filled = jnp.arange(cap) < jnp.minimum(
            jnp.sum(active.astype(jnp.int32)), cap)
        src_s = jnp.where(filled, src, 0)
        sub = (
            filled,
            prev_key[src_s],
            best_t[src_s],
            best_i[src_s],
            best_u[src_s],
            best_v[src_s],
        )
        ro_c = ro[src_s]
        rd_c = rd[src_s]
        inv_c = inv_d[src_s]
        tm_c = t_max[src_s]
        sub = jax.lax.fori_loop(
            0, K_INNER,
            lambda _, s: _sweep_body(scene, ro_c, rd_c, inv_c, tm_c, t_c, s),
            sub,
        )
        s_act, s_key, s_t, s_i, s_u, s_v = sub
        dst = jnp.where(filled, src, n)
        upd = lambda a, v_: a.at[dst].set(v_, mode="drop")  # noqa: E731
        return (
            upd(active & (rank >= cap), s_act),
            upd(prev_key, s_key),
            upd(best_t, s_t),
            upd(best_i, s_i),
            upd(best_u, s_u),
            upd(best_v, s_v),
        )

    c = jax.lax.while_loop(outer_cond, outer_body, c)
    _, _, t, tri, u, v = c
    return {"t": t, "tri": tri, "u": u, "v": v, "valid": tri >= 0}


@jax.jit
def occluded(scene, ro, rd, t_max):
    """Any-hit within (EPS, t_max)."""
    n = ro.shape[0]
    t_c = scene.clas_ids.shape[1]
    safe_d = jnp.where(jnp.abs(rd) > 1e-12,
                       rd, jnp.where(rd >= 0, 1e-12, -1e-12))
    inv_d = 1.0 / safe_d

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        active, prev_key, occ = c
        key = _round_key(scene, ro, rd, inv_d, t_max, prev_key)
        act = active & (key != KEY_MISS)
        cluster = jnp.where(act, key & ID_MASK, 0)
        ct, ci, _, _ = _test_cluster(scene, ro, rd, cluster, t_max, t_c)
        # ci is an argmin slot and can be ≥ 0 without any hit; the
        # returned distance is INF unless a real hit beat t_max.
        hit = act & (ci >= 0) & (ct < t_max)
        occ = occ | hit
        return (act & ~hit, jnp.where(act, key, prev_key), occ)

    init = (jnp.ones(n, bool), jnp.full((n,), jnp.int32(-2**31)),
            jnp.zeros(n, bool))
    _, _, occ = jax.lax.while_loop(cond, body, init)
    return occ
