"""In-kernel two-phase cluster-cull ray intersector (C14 at scale).

The XLA cluster sweep (render/clas.py) pays, per selection round, an
[N, C] slab sweep plus a ~9 KB per-ray cluster-row gather — both at XLA's
per-row serial gather floor, giving 0.13 Mrays/s end-to-end at 111k tris
(PERF.md round 3/4). This kernel restructures the work the TPU way
(reference equivalent: mitsuba/include/mitsuba/render/{gkdtree.h,
triaccel.h} — the SAH kd-tree hot loop, re-designed rather than ported):

- Rays are processed in [RT, 128] VMEM tiles; the whole cluster AABB
  table ([8, C] ≤ 64 KB) is VMEM-resident per tile.
- Phase 1 (cull): for each cluster, one vectorized slab test over the
  tile against each ray's CURRENT best-hit distance; a scalar any-reduce
  decides whether the cluster's triangles are fetched at all.
- Phase 2 (stream): surviving clusters' Woop-precomputed triangle rows
  ([12, Tc] ≈ 12 KB) are DMA'd from HBM into a VMEM buffer and swept
  densely against the tile (the same register-resident winner carry as
  ops/bounce_pallas.hit_sweep).

Per-ray best distances tighten as clusters are processed, so later
clusters cull in phase 1 — the in-kernel equivalent of the XLA path's
closest-first early-out, at tile granularity, with zero gather rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38  # plain float: a jnp scalar would be a captured constant
EPS = 1e-6
RT = 16  # sublane rows per ray tile -> RT*128 = 2048 rays
SWEEP_CHUNK = 128  # unrolled triangle columns per inner chunk


def build_woop_rows(lo: np.ndarray, hi: np.ndarray, rows: np.ndarray,
                    t_c: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: cluster MT rows [C, 9*t_c] → Woop rows [C, 12, t_c]
    (B = [e1 e2 n]^-1 row-major + c = -B·v0; same precompute as
    ops/bounce_pallas.build_tables) plus the padded AABB table [8, Cp].

    Padding triangles (all-zero rows) give d'_z = 0 -> never hit;
    padding clusters get +INF AABBs -> never selected.
    """
    c = rows.shape[0]
    r = rows.reshape(c, 9, t_c)
    v0 = np.stack([r[:, 0], r[:, 1], r[:, 2]], axis=-1)  # [C, Tc, 3]
    e1 = np.stack([r[:, 3], r[:, 4], r[:, 5]], axis=-1)
    e2 = np.stack([r[:, 6], r[:, 7], r[:, 8]], axis=-1)
    n = np.cross(e1, e2)
    a = np.stack([e1, e2, n], axis=-1)  # [C, Tc, 3, 3]
    det = np.linalg.det(a)
    ok = np.abs(det) > 1e-24
    a_safe = np.where(ok[..., None, None], a, np.eye(3))
    b = np.where(ok[..., None, None], np.linalg.inv(a_safe), 0.0)
    cvec = np.where(ok[..., None], -np.einsum("ctij,ctj->cti", b, v0), 0.0)
    woop = np.concatenate(
        [b.reshape(c, t_c, 9), cvec], axis=-1
    ).transpose(0, 2, 1).astype(np.float32)  # [C, 12, Tc]

    cp = max(128, -(-c // 128) * 128)
    aabb = np.full((8, cp), np.float32(3.4e38))
    aabb[0:3, :c] = lo.T
    aabb[3:6, :c] = hi.T
    # Padding clusters: lo=+INF, hi=-INF -> tmin > tmax -> never hit.
    aabb[3:6, c:] = -np.float32(3.4e38)
    aabb[6:] = 0.0
    return woop, aabb.astype(np.float32)


def _kernel(n_clusters: int, t_c: int):
    n_chunks = t_c // SWEEP_CHUNK
    assert t_c % SWEEP_CHUNK == 0

    def kernel(aabb_ref, rays_ref, rows_hbm, out_ref, state, row_buf, sem):
        rox = rays_ref[0]
        roy = rays_ref[1]
        roz = rays_ref[2]
        rdx = rays_ref[3]
        rdy = rays_ref[4]
        rdz = rays_ref[5]
        tmax = rays_ref[6]

        def safe_inv(d):
            good = jnp.abs(d) > 1e-12
            dd = jnp.where(good, d, jnp.where(d >= 0, 1e-12, -1e-12))
            return 1.0 / dd

        ix = safe_inv(rdx)
        iy = safe_inv(rdy)
        iz = safe_inv(rdz)

        state[0] = jnp.full_like(rox, INF)
        state[1] = jnp.full_like(rox, -1.0)  # winner code (f32)
        state[2] = jnp.zeros_like(rox)
        state[3] = jnp.zeros_like(rox)

        def cluster_body(c, _):
            lx = aabb_ref[0, c]
            ly = aabb_ref[1, c]
            lz = aabb_ref[2, c]
            hx = aabb_ref[3, c]
            hy = aabb_ref[4, c]
            hz = aabb_ref[5, c]
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
            tmx = jnp.minimum(
                jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
                jnp.maximum(az0, az1),
            )
            limit = jnp.minimum(state[0], tmax)
            box_hit = (tmx >= jnp.maximum(tmin, 0.0)) & (tmin < limit)
            any_hit = jnp.any(box_hit)

            @pl.when(any_hit)
            def _():
                dma = pltpu.make_async_copy(rows_hbm.at[c], row_buf, sem)
                dma.start()
                dma.wait()
                best_t = state[0]
                bcode = state[1]
                bu = state[2]
                bv = state[3]
                base = (c * t_c).astype(jnp.float32)
                for ch in range(n_chunks):
                    tri = row_buf[:, pl.ds(ch * SWEEP_CHUNK, SWEEP_CHUNK)]
                    for j in range(SWEEP_CHUNK):
                        b0, b1, b2 = tri[0, j], tri[1, j], tri[2, j]
                        b3, b4, b5 = tri[3, j], tri[4, j], tri[5, j]
                        b6, b7, b8 = tri[6, j], tri[7, j], tri[8, j]
                        c0, c1, c2 = tri[9, j], tri[10, j], tri[11, j]
                        dpz = b6 * rdx + b7 * rdy + b8 * rdz
                        good = jnp.abs(dpz) > 1e-12
                        inv = jnp.where(
                            good, 1.0 / jnp.where(good, dpz, 1.0), 0.0)
                        opz = b6 * rox + b7 * roy + b8 * roz + c2
                        t = -opz * inv
                        u = (b0 * rox + b1 * roy + b2 * roz + c0) + t * (
                            b0 * rdx + b1 * rdy + b2 * rdz)
                        v = (b3 * rox + b4 * roy + b5 * roz + c1) + t * (
                            b3 * rdx + b4 * rdy + b5 * rdz)
                        better = (
                            good & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                            & (t > EPS) & (t < best_t) & (t < tmax)
                        )
                        best_t = jnp.where(better, t, best_t)
                        bcode = jnp.where(
                            better, base + float(ch * SWEEP_CHUNK + j),
                            bcode)
                        bu = jnp.where(better, u, bu)
                        bv = jnp.where(better, v, bv)
                state[0] = best_t
                state[1] = bcode
                state[2] = bu
                state[3] = bv

            return 0

        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)
        out_ref[0] = state[0]
        out_ref[1] = state[1]
        out_ref[2] = state[2]
        out_ref[3] = state[3]

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def intersect_tiles(rays, aabb, woop_rows, interpret: bool = False):
    """rays [8, R, 128] (rox..rdz, tmax, pad); aabb [8, Cp];
    woop_rows [C, 12, Tc]. Returns [4, R, 128]: t, code, u, v
    (code = cluster*Tc + slot as f32; -1 = miss)."""
    n_rows = rays.shape[1]
    assert n_rows % RT == 0, n_rows
    n_tiles = n_rows // RT
    c, _, t_c = woop_rows.shape
    kernel = _kernel(c, t_c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, n_rows, 128), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, aabb.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((8, RT, 128), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((4, RT, 128), lambda i: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, RT, 128), jnp.float32),
            pltpu.VMEM((12, t_c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(aabb, rays, woop_rows)


def intersect(scene, ro, rd, t_max=None, interpret: bool = False):
    """Drop-in for render/clas.intersect on TPU: same hit record."""
    n = ro.shape[0]
    t_c = scene.clas_ids.shape[1]
    if t_max is None:
        t_max = jnp.full((n,), INF)
    tile = RT * 128
    pad = (-n) % tile
    rays = jnp.concatenate(
        [ro.T, rd.T, t_max[None, :], jnp.zeros((1, n))], axis=0)
    # Pad with origin/direction 1e30: slab entry/exit collapse to ~-1 for
    # every box, so padded rays never trigger a cluster fetch.
    rays = jnp.pad(rays, ((0, 0), (0, pad)), constant_values=1e30)
    rays = rays.reshape(8, -1, 128)
    out = intersect_tiles(rays, scene.clas_aabb, scene.clas_woop,
                          interpret=interpret)
    out = out.reshape(4, -1)[:, :n]
    t = out[0]
    code = out[1].astype(jnp.int32)
    hit = code >= 0
    tri = jnp.where(
        hit, scene.clas_ids.reshape(-1)[jnp.maximum(code, 0)], -1)
    hit = hit & (tri >= 0)
    return {
        "t": jnp.where(hit, t, INF),
        "tri": jnp.where(hit, tri, -1),
        "u": out[2],
        "v": out[3],
        "valid": hit,
    }


def occluded(scene, ro, rd, t_max, interpret: bool = False):
    """Any-hit within (EPS, t_max): the closest-hit kernel bounded by
    t_max already answers it."""
    res = intersect(scene, ro, rd, t_max=t_max, interpret=interpret)
    return res["valid"] & (res["t"] < t_max)
