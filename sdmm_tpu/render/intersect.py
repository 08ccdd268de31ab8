"""Wavefront ray–scene intersection.

TPU-native replacement of the reference's SAH kd-tree traversal
(reference: mitsuba/include/mitsuba/render/{gkdtree.h,sahkdtree3.h,triaccel.h}
— the per-ray hot path). Irregular tree traversal is hostile to the TPU's
vector units, so small/medium scenes use a chunked brute-force batched
Möller–Trumbore sweep (dense [rays × tris] work that XLA maps onto the VPU),
with a `lax.scan` over triangle chunks to bound memory. Larger scenes layer a
BVH on top (see bvh.py).
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp

INF = jnp.float32(3.4e38)
EPS = 1e-6


def _mt_chunk(ro, rd, v0, e1, e2, t_max):
    """Möller–Trumbore for [N] rays × [C] tris → per-pair (t, u, v, hit).

    Component-scalarized: every intermediate is a flat [N, C] array built
    from [N,1]×[1,C] broadcasts. The vector form ([N,C,3] cross products)
    forced XLA to materialize six ~[N,C,3] fusions per sweep in HBM —
    profiled at 70% of the whole render step; the scalar form fuses into a
    couple of [N,C] elementwise+reduce kernels.
    """
    rox, roy, roz = (ro[:, i : i + 1] for i in range(3))  # [N,1]
    rdx, rdy, rdz = (rd[:, i : i + 1] for i in range(3))
    v0x, v0y, v0z = (v0[None, :, i] for i in range(3))  # [1,C]
    e1x, e1y, e1z = (e1[None, :, i] for i in range(3))
    e2x, e2y, e2z = (e2[None, :, i] for i in range(3))

    px = rdy * e2z - rdz * e2y  # [N,C]
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    # Double-where: 1/det for near-parallel rays must stay finite in the
    # BACKWARD pass too (reverse-mode of the unselected branch otherwise
    # overflows and poisons gradients w.r.t. ray direction — hit when
    # differentiating roughness through the sampled bounce direction).
    det_ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
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
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPS)
        & (t < t_max[:, None])
    )
    return t, u, v, hit


def _pick_chunk(n_tris: int, chunk: int) -> int:
    """Chunk sized to the scene: tiny scenes get one dense pass with minimal
    padding (multiple of 8 vector sublanes), large scenes scan fixed chunks."""
    if n_tris <= chunk:
        return max(8, -(-n_tris // 8) * 8)
    return chunk


# Above this triangle count the dense sweep loses to BVH traversal.
BRUTE_FORCE_MAX = 1024


def _use_pallas() -> bool:
    """Opt-in Pallas sweep (SDMM_TPU_PALLAS_ISECT=1), TPU backends only.

    Standalone the Pallas kernel is ~1.4× the XLA sweep, but inside the
    bounce scan the pad/transpose copies around pallas_call currently eat
    the win (profiled 2026-08: 2.05 vs 2.30 Mrays/s end-to-end). Default
    stays XLA until the kernel takes the scene in its native layout.
    """
    import os

    import jax

    if not os.environ.get("SDMM_TPU_PALLAS_ISECT"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@partial(jax.jit, static_argnames=("chunk",))
def intersect(scene, ro, rd, t_max=None, chunk: int = 512):
    """Closest hit. Returns dict with t, tri [int32, -1=miss], u, v, valid.

    Small scenes use the Pallas VMEM-resident sweep (ops/intersect_pallas);
    large scenes the threaded BVH (render/bvh.py). Dispatch is static
    (triangle count is a trace-time constant). The XLA chunked sweep below
    is kept as the CPU/interpret fallback and correctness oracle.
    """
    n_tris = scene.tri_v0.shape[0]
    if n_tris > BRUTE_FORCE_MAX:
        if os.environ.get("SDMM_TPU_BVH"):
            from . import bvh

            return bvh.traverse(scene, ro, rd, t_max, any_hit=False)
        from . import clas

        return clas.intersect(scene, ro, rd, t_max)
    if _use_pallas():
        from ..ops.intersect_pallas import mt_sweep_native

        n_rays = ro.shape[0]
        if t_max is None:
            t_max = jnp.full((n_rays,), INF)
        return mt_sweep_native(
            ro, rd, t_max, scene.ptri_v0, scene.ptri_e1, scene.ptri_e2, n_tris
        )
    n_rays = ro.shape[0]
    if t_max is None:
        t_max = jnp.full((n_rays,), INF)
    chunk = _pick_chunk(n_tris, chunk)
    pad = (-n_tris) % chunk
    v0 = jnp.pad(scene.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(scene.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(scene.tri_e2, ((0, pad), (0, 0)))
    n_chunks = (n_tris + pad) // chunk

    def body(carry, ci):
        best_t, best_i, best_u, best_v = carry
        sl = ci * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, sl, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, sl, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, sl, chunk)
        t, u, v, hit = _mt_chunk(ro, rd, cv0, ce1, ce2, t_max)
        tri_ids = sl + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        valid_tri = tri_ids < n_tris
        t = jnp.where(hit & valid_tri, t, INF)
        arg = jnp.argmin(t, axis=-1)
        cand_t = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        cand_i = jnp.take_along_axis(tri_ids, arg[:, None], axis=-1)[:, 0]
        cand_u = jnp.take_along_axis(u, arg[:, None], axis=-1)[:, 0]
        cand_v = jnp.take_along_axis(v, arg[:, None], axis=-1)[:, 0]
        better = cand_t < best_t
        return (
            jnp.where(better, cand_t, best_t),
            jnp.where(better, cand_i, best_i),
            jnp.where(better, cand_u, best_u),
            jnp.where(better, cand_v, best_v),
        ), None

    init = (
        jnp.full((n_rays,), INF),
        jnp.full((n_rays,), -1, dtype=jnp.int32),
        jnp.zeros((n_rays,)),
        jnp.zeros((n_rays,)),
    )
    (t, tri, u, v), _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    valid = tri >= 0
    return {"t": t, "tri": tri, "u": u, "v": v, "valid": valid}


@partial(jax.jit, static_argnames=("chunk",))
def occluded(scene, ro, rd, t_max, chunk: int = 512):
    """Any-hit within (EPS, t_max). Returns bool [N]."""
    n_tris = scene.tri_v0.shape[0]
    if n_tris > BRUTE_FORCE_MAX:
        if os.environ.get("SDMM_TPU_BVH"):
            from . import bvh

            return bvh.traverse(scene, ro, rd, t_max, any_hit=True)
        from . import clas

        return clas.occluded(scene, ro, rd, t_max)
    if _use_pallas():
        from ..ops.intersect_pallas import mt_sweep_native

        return mt_sweep_native(
            ro, rd, t_max, scene.ptri_v0, scene.ptri_e1, scene.ptri_e2, n_tris
        )["valid"]
    chunk = _pick_chunk(n_tris, chunk)
    pad = (-n_tris) % chunk
    v0 = jnp.pad(scene.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(scene.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(scene.tri_e2, ((0, pad), (0, 0)))
    n_chunks = (n_tris + pad) // chunk

    def body(carry, ci):
        sl = ci * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, sl, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, sl, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, sl, chunk)
        _, _, _, hit = _mt_chunk(ro, rd, cv0, ce1, ce2, t_max)
        tri_ids = sl + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        hit = hit & (tri_ids < n_tris)
        return carry | jnp.any(hit, axis=-1), None

    occ, _ = jax.lax.scan(
        body, jnp.zeros(ro.shape[0], dtype=bool), jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return occ


def surface_interaction(scene, ro, rd, hit):
    """Derive hit-point attributes (position, normals) from an intersect() result."""
    tri = jnp.maximum(hit["tri"], 0)
    # Missed rays have t = INF; clamp so downstream math (NEE, guiding) stays
    # finite — their contributions are masked out, but NaNs would still
    # poison reverse-mode gradients through jnp.where.
    t_safe = jnp.where(hit["valid"], hit["t"], 0.0)
    p = ro + t_safe[:, None] * rd
    ng = scene.tri_ng[tri]
    # Flat [T, 9] gather avoids 3-D layout-conversion copies on TPU.
    ns_flat = scene.tri_ns.reshape(-1, 9)[tri]  # [N, 9]
    u = hit["u"][:, None]
    v = hit["v"][:, None]
    ns = (
        ns_flat[:, 0:3] * (1.0 - u - v)
        + ns_flat[:, 3:6] * u
        + ns_flat[:, 6:9] * v
    )
    ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-20)
    uv_flat = scene.tri_uv.reshape(-1, 6)[tri]  # [N, 6]
    uv = (
        uv_flat[:, 0:2] * (1.0 - u - v)
        + uv_flat[:, 2:4] * u
        + uv_flat[:, 4:6] * v
    )
    if scene.tri_vc.shape[0] > 0 or scene.tri_eh.shape[0] > 0:
        # Mesh-attribute texture channels ride along in the uv row
        # (reference: Intersection.color / per-hit edge distances used by
        # src/textures/{vertexcolors,curvature,wireframe}.cpp). Widening
        # uv to [N, 6] = (u, v, vc.rgb, edge_dist) keeps the 26
        # gather_params call sites unchanged; bsdf._gather_raw consumes
        # channels 2:6 only for proc-texture rows.
        u1, v1 = hit["u"], hit["v"]  # [N]
        b0 = 1.0 - u1 - v1
        if scene.tri_vc.shape[0] > 0:
            vc_flat = scene.tri_vc[tri]  # [N, 9]
            vc = (vc_flat[:, 0:3] * b0[:, None]
                  + vc_flat[:, 3:6] * u1[:, None]
                  + vc_flat[:, 6:9] * v1[:, None])
        else:
            vc = jnp.zeros(uv.shape[:-1] + (3,))
        if scene.tri_eh.shape[0] > 0:
            eh = scene.tri_eh[tri]  # [N, 3]
            # Distance to the nearest edge LINE: min_i bary_i · h_i. For
            # interior points this equals the reference's point-to-segment
            # minimum (wireframe.cpp:110-119) except within a corner's
            # Voronoi region, where it slightly underestimates (draws
            # marginally thicker corners).
            ed = jnp.minimum(
                jnp.minimum(b0 * eh[:, 0], u1 * eh[:, 1]), v1 * eh[:, 2]
            )
        else:
            ed = jnp.zeros(uv.shape[:-1])
        uv = jnp.concatenate([uv, vc, ed[:, None]], axis=-1)
    # Align shading normal hemisphere handling is done by BSDF frame logic.
    bsdf = scene.tri_bsdf[tri]
    emitter = scene.tri_emitter[tri]
    return {
        "p": p,
        "ng": ng,
        "ns": ns,
        "uv": uv,
        "tri": tri,
        "bsdf": bsdf,
        "emitter": jnp.where(hit["valid"], emitter, -1),
        "valid": hit["valid"],
        "t": hit["t"],
        "u_bary": hit["u"],
        "v_bary": hit["v"],
    }


def apply_bumpmap(scene, it: dict) -> jnp.ndarray:
    """Perturb shading normals with a height texture
    (reference: mitsuba/src/bsdfs/bumpmap.cpp — offsets the tangent-space
    frame by the texture's uv gradient). Returns the new ns [N, 3]; rays
    whose BSDF carries no bump texture keep their normals.
    """
    from ..bsdf.bsdf import sample_texture
    from ..core.spectrum import luminance

    raw = scene.bsdf_bump[it["bsdf"]]
    scale = scene.bsdf_bump_scale[it["bsdf"]]
    # Encoding: -1 = none, >=0 = height texture (bumpmap), <=-2 = tangent-
    # space normal texture stored as -(tex_id+2) (reference:
    # bsdfs/normalmap.cpp; keeps SceneData's single bump column).
    is_normalmap = raw <= -2
    has = raw >= 0
    tex_id = jnp.where(is_normalmap, -raw - 2, raw)
    tid = jnp.maximum(tex_id, 0)
    r = scene.textures.shape[1]
    eps = 1.0 / r
    uv = it["uv"]

    def h(uv_):
        return luminance(sample_texture(scene.textures, tid, uv_))

    du = jnp.zeros_like(uv).at[..., 0].set(eps)
    dv = jnp.zeros_like(uv).at[..., 1].set(eps)
    gu = (h(uv + du) - h(uv - du)) / (2.0 * eps)
    gv = (h(uv + dv) - h(uv - dv)) / (2.0 * eps)

    # Tangents from the triangle's uv parameterization.
    tri = it["tri"]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    uv_flat = scene.tri_uv.reshape(-1, 6)[tri]
    duv1 = uv_flat[:, 2:4] - uv_flat[:, 0:2]
    duv2 = uv_flat[:, 4:6] - uv_flat[:, 0:2]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    det_ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(
        det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)[:, None]
    dpdu = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv_det
    dpdv = (-duv2[:, 0:1] * e1 + duv1[:, 0:1] * e2) * inv_det

    ns = it["ns"]
    dpdu_b = dpdu + (scale * gu)[:, None] * ns
    dpdv_b = dpdv + (scale * gv)[:, None] * ns
    n_new = jnp.cross(dpdu_b, dpdv_b)
    n_new = n_new * jnp.sign(jnp.sum(n_new * ns, axis=-1, keepdims=True))
    n_norm = jnp.linalg.norm(n_new, axis=-1, keepdims=True)
    ok = has & (jnp.abs(det) > 1e-12) & (n_norm[..., 0] > 1e-12)
    n_new = n_new / jnp.maximum(n_norm, 1e-20)
    out = jnp.where(ok[:, None], n_new, ns)

    # Normal map: the texture IS the tangent-space normal (rgb → 2c-1),
    # rotated into the (dpdu⊥, ·, ns) frame (reference: normalmap.cpp).
    c = sample_texture(scene.textures, tid, uv)
    n_tan = 2.0 * c - 1.0
    tang = dpdu - ns * jnp.sum(dpdu * ns, axis=-1, keepdims=True)
    t_norm = jnp.linalg.norm(tang, axis=-1, keepdims=True)
    tang = tang / jnp.maximum(t_norm, 1e-20)
    bit = jnp.cross(ns, tang)
    n_nm = (tang * n_tan[..., 0:1] + bit * n_tan[..., 1:2]
            + ns * jnp.maximum(n_tan[..., 2:3], 1e-3))
    n_nm = n_nm / jnp.maximum(
        jnp.linalg.norm(n_nm, axis=-1, keepdims=True), 1e-20
    )
    ok_nm = is_normalmap & (t_norm[..., 0] > 1e-12)
    return jnp.where(ok_nm[:, None], n_nm, out)
