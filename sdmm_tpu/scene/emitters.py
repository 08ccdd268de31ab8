"""Area-emitter sampling for next-event estimation.

Equivalent of the reference's Scene::sampleEmitterDirect /
pdfEmitterDirect (reference: mitsuba/src/librender/scene.cpp) specialized to
area lights over the emissive-triangle CDF built at scene load, plus a
constant environment term (reference: mitsuba/src/emitters/constant.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.frame import normalize


def sample_direct(scene, p: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Sample a point on an emissive triangle; returns solid-angle record.

    p: [N, 3] reference points; u1: [N]; u2: [N, 2].
    """
    m = scene.em_tri_idx.shape[0]
    if m == 0:
        z = jnp.zeros(p.shape[0])
        return {
            "d": jnp.zeros_like(p), "dist": z, "pdf": z,
            "radiance": jnp.zeros_like(p), "n": jnp.zeros_like(p),
            "valid": jnp.zeros(p.shape[0], dtype=bool),
        }
    sel = jnp.clip(jnp.searchsorted(scene.em_tri_cdf, u1), 0, m - 1)
    tri = scene.em_tri_idx[sel]
    b = warp.square_to_uniform_triangle(u2)
    y = (
        scene.tri_v0[tri]
        + b[..., 0:1] * scene.tri_e1[tri]
        + b[..., 1:2] * scene.tri_e2[tri]
    )
    n = scene.tri_ng[tri]
    to_y = y - p
    dist2 = jnp.sum(to_y * to_y, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    d = to_y / dist[..., None]
    cos_l = -jnp.sum(n * d, axis=-1)
    pdf_area = scene.em_tri_pdf[sel] / jnp.maximum(scene.em_tri_area[sel], 1e-20)
    pdf_sa = pdf_area * dist2 / jnp.maximum(cos_l, 1e-12)
    valid = (cos_l > 1e-6) & (dist2 > 1e-12)
    radiance = scene.emitter_radiance[scene.tri_emitter[tri]]
    return {
        "d": d, "dist": dist, "pdf": jnp.where(valid, pdf_sa, 0.0),
        "radiance": radiance, "n": n, "valid": valid,
    }


def tri_pdf_over_area(scene):
    """Dense [T] map: triangle → discrete-selection pdf / area (0 if not emissive)."""
    n_tris = scene.tri_v0.shape[0]
    dense = jnp.zeros((n_tris,))
    if scene.em_tri_idx.shape[0]:
        dense = dense.at[scene.em_tri_idx].set(
            scene.em_tri_pdf / jnp.maximum(scene.em_tri_area, 1e-20)
        )
    return dense


def pdf_direct_hit(scene, pdf_over_area_dense, tri, d, dist):
    """Solid-angle NEE pdf of hitting emissive triangle ``tri`` along d at dist."""
    n = scene.tri_ng[jnp.maximum(tri, 0)]
    cos_l = -jnp.sum(n * d, axis=-1)
    pdf_area = pdf_over_area_dense[jnp.maximum(tri, 0)]
    pdf = pdf_area * dist * dist / jnp.maximum(cos_l, 1e-12)
    return jnp.where((tri >= 0) & (cos_l > 1e-6), pdf, 0.0)


def eval_emitter(scene, interaction, wi_world):
    """Radiance emitted toward wi_world from a hit (front side only)."""
    em = interaction["emitter"]
    rad = scene.emitter_radiance[jnp.maximum(em, 0)]
    front = jnp.sum(interaction["ng"] * wi_world, axis=-1) > 0.0
    return jnp.where(((em >= 0) & front)[..., None], rad, 0.0)
