"""Pallas TPU kernel: batched Möller–Trumbore ray/triangle sweep.

The hot-path replacement for the reference's kd-tree traversal on small/
medium scenes (reference: mitsuba/include/mitsuba/render/triaccel.h — the
per-ray hot loop). The XLA version materializes [rays × tris] intermediates
in HBM; this kernel keeps the whole triangle soup and all intermediates in
VMEM: HBM traffic is just rays in and hit records out, so the sweep runs at
VPU speed instead of HBM speed.

Layouts chosen for the TPU memory model: triangles are stored transposed
[3, T] so a chunk slice [1, TRI_CHUNK] is lane-contiguous; per-ray values
are [TILE_RAYS, 1] columns broadcasting against [1, TRI_CHUNK] rows.

Grid: ray tiles of TILE_RAYS; inner fori_loop over triangle chunks.
Padded triangle slots carry degenerate data (det = 0 → miss).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_RAYS = 256
TRI_CHUNK = 128
INF = 3.4e38  # python float: pallas kernels must not capture traced values
EPS = 1e-6


def _mt_kernel(n_chunks: int):
    def kernel(ro_ref, rd_ref, tmax_ref, v0_ref, e1_ref, e2_ref,
               t_ref, i_ref, u_ref, v_ref):
        rox = ro_ref[:, 0:1]  # [TILE, 1]
        roy = ro_ref[:, 1:2]
        roz = ro_ref[:, 2:3]
        rdx = rd_ref[:, 0:1]
        rdy = rd_ref[:, 1:2]
        rdz = rd_ref[:, 2:3]
        t_max = tmax_ref[:]  # [TILE, 1]

        def chunk_body(c, carry):
            best_t, best_i, best_u, best_v = carry
            sl = pl.ds(c * TRI_CHUNK, TRI_CHUNK)
            v0x = v0_ref[0:1, sl]  # [1, CHUNK] — lane-contiguous
            v0y = v0_ref[1:2, sl]
            v0z = v0_ref[2:3, sl]
            e1x = e1_ref[0:1, sl]
            e1y = e1_ref[1:2, sl]
            e1z = e1_ref[2:3, sl]
            e2x = e2_ref[0:1, sl]
            e2y = e2_ref[1:2, sl]
            e2z = e2_ref[2:3, sl]

            # pvec = rd × e2 → [TILE, CHUNK] per component.
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tx = rox - v0x
            ty = roy - v0y
            tz = roz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            # qvec = tvec × e1.
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                (jnp.abs(det) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > EPS)
                & (t < jnp.minimum(best_t, t_max))
            )
            t = jnp.where(ok, t, INF)
            # Row-wise argmin over the chunk.
            tmin = jnp.min(t, axis=1, keepdims=True)
            col = jax.lax.broadcasted_iota(jnp.int32, (TILE_RAYS, TRI_CHUNK), 1)
            amin = jnp.min(
                jnp.where(t <= tmin, col, jnp.int32(2**30)), axis=1, keepdims=True
            )
            sel = col == amin
            cand_u = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
            cand_v = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
            cand_i = amin + c * TRI_CHUNK
            better = tmin < best_t
            return (
                jnp.where(better, tmin, best_t),
                jnp.where(better, cand_i, best_i),
                jnp.where(better, cand_u, best_u),
                jnp.where(better, cand_v, best_v),
            )

        init = (
            jnp.full((TILE_RAYS, 1), INF),
            jnp.full((TILE_RAYS, 1), -1, dtype=jnp.int32),
            jnp.zeros((TILE_RAYS, 1)),
            jnp.zeros((TILE_RAYS, 1)),
        )
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, n_chunks, chunk_body, init
        )
        t_ref[:] = best_t
        i_ref[:] = best_i
        u_ref[:] = best_u
        v_ref[:] = best_v

    return kernel


@jax.jit
def mt_sweep(ro, rd, t_max, v0, e1, e2):
    """Closest-hit sweep: rays [N,3] × triangles [T,3] → hit record dict.

    T must be small enough for the soup to sit in VMEM (callers above
    ~2k triangles use the BVH). N and T are padded internally. Prefer
    mt_sweep_native with pre-transposed scene arrays in hot loops.
    """
    t = v0.shape[0]
    t_pad = (-t) % TRI_CHUNK
    # Transposed [3, Tp] triangle layout (lane-contiguous chunk slices).
    v0_p = jnp.pad(v0, ((0, t_pad), (0, 0))).T
    e1_p = jnp.pad(e1, ((0, t_pad), (0, 0))).T
    e2_p = jnp.pad(e2, ((0, t_pad), (0, 0))).T
    return mt_sweep_native(ro, rd, t_max, v0_p, e1_p, e2_p, t)


@partial(jax.jit, static_argnames=("n_tris",))
def mt_sweep_native(ro, rd, t_max, v0_p, e1_p, e2_p, n_tris: int):
    """Closest-hit sweep over pre-transposed [3, Tp] triangle arrays."""
    n = ro.shape[0]
    t = n_tris
    n_pad = (-n) % TILE_RAYS
    ro_p = jnp.pad(ro, ((0, n_pad), (0, 0)))
    rd_p = jnp.pad(rd, ((0, n_pad), (0, 0)), constant_values=1.0)
    tm_p = jnp.pad(t_max.reshape(-1, 1), ((0, n_pad), (0, 0)))
    n_tot = n + n_pad
    n_chunks = v0_p.shape[1] // TRI_CHUNK

    grid = (n_tot // TILE_RAYS,)
    out_t, out_i, out_u, out_v = pl.pallas_call(
        _mt_kernel(n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_RAYS, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_RAYS, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_RAYS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole triangle arrays
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_RAYS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_RAYS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_RAYS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_RAYS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tot, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tot, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tot, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tot, 1), jnp.float32),
        ],
    )(ro_p, rd_p, tm_p, v0_p, e1_p, e2_p)
    idx = out_i[:n, 0]
    valid = (idx >= 0) & (idx < t)
    return {
        "t": out_t[:n, 0],
        "tri": jnp.where(valid, idx, -1),
        "u": out_u[:n, 0],
        "v": out_v[:n, 0],
        "valid": valid,
    }
