"""Homogeneous media + Henyey-Greenstein phase function.

TPU-native equivalent of the reference's medium/phase plugins
(reference: mitsuba/src/medium/homogeneous.cpp, mitsuba/src/phase/hg.cpp).
Media live in a table (row 0 = vacuum); each ray carries a medium id that
switches at transmissive boundaries (reference: Shape interior/exterior
medium pointers, include/mitsuba/render/shape.h). Distance sampling uses
the mean extinction as the sampling density with per-channel transmittance
reweighting; all functions are batched and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.frame import coordinate_system, to_world


def sample_distance(scene, med_id: jnp.ndarray, u: jnp.ndarray,
                    t_surf: jnp.ndarray):
    """Sample a free-flight distance against the per-ray mean extinction.

    Returns dict(t, scattered [bool], weight [N,3]) where weight is the
    per-channel transmittance / pdf ratio for the chosen event (medium
    scatter at t, or reaching the surface at t_surf). Vacuum rows
    (sigma_t = 0) never scatter and weigh 1.
    """
    sigma_t = scene.med_sigma_t[med_id]  # [N, 3]
    sigma_bar = jnp.mean(sigma_t, axis=-1)  # [N]
    in_medium = sigma_bar > 1e-12
    sb = jnp.maximum(sigma_bar, 1e-8)
    t_med = -jnp.log1p(-jnp.minimum(u, 1.0 - 1e-7)) / sb
    scattered = in_medium & (t_med < t_surf)
    t = jnp.where(scattered, t_med, t_surf)
    # Medium event: weight = sigma_s·e^{-sigma_t t} / (sigma_bar·e^{-sigma_bar t})
    tr = jnp.exp(-sigma_t * t[:, None])
    pdf_med = sb * jnp.exp(-sb * t)
    pdf_surf = jnp.exp(-sb * t)
    sigma_s = sigma_t * scene.med_albedo[med_id]
    w_med = sigma_s * tr / jnp.maximum(pdf_med, 1e-30)[:, None]
    w_surf = tr / jnp.maximum(pdf_surf, 1e-30)[:, None]
    weight = jnp.where(scattered[:, None], w_med, w_surf)
    weight = jnp.where(in_medium[:, None], weight, 1.0)
    return {"t": t, "scattered": scattered, "weight": weight}


def density_at(scene, med_id: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Grid-density lookup for heterogeneous media (nearest cell;
    reference: src/volume/gridvolume.cpp lookupFloat). 1 for homogeneous
    rows, 0 outside the grid bounds."""
    vol = scene.med_vol[med_id]
    has = vol >= 0
    v = jnp.maximum(vol, 0)
    q = (p - scene.med_vol_lo[med_id]) * scene.med_vol_inv_ext[med_id]
    inside = jnp.all((q >= 0.0) & (q < 1.0), axis=-1)
    r = scene.volumes.shape[1]
    ijk = jnp.clip((q * r).astype(jnp.int32), 0, r - 1)
    dens = scene.volumes[v, ijk[..., 2], ijk[..., 1], ijk[..., 0]]
    return jnp.where(has, jnp.where(inside, dens, 0.0), 1.0)


def sample_distance_hetero(scene, med_id: jnp.ndarray, key,
                           ro: jnp.ndarray, rd: jnp.ndarray,
                           t_surf: jnp.ndarray, max_steps: int = 64):
    """Woodcock (delta) tracking through grid-density media
    (reference: src/medium/heterogeneous.cpp sampleDistance): free-flight
    against the majorant; null collisions where the local density is
    below it. Gray extinction (mean sigma_t channel) drives the tracking;
    the per-channel ratio reweights the throughput.

    Returns dict(t, scattered, weight) like sample_distance.
    """
    n = ro.shape[0]
    sigma_t = scene.med_sigma_t[med_id]  # [N, 3]
    sigma_bar = jnp.mean(sigma_t, axis=-1)
    maj = scene.med_majorant[med_id] * sigma_bar  # [N]
    in_medium = maj > 1e-12

    def body(i, state):
        t, done, scattered = state
        k_i = jax.random.fold_in(key, i)
        u1 = jax.random.uniform(k_i, (n,))
        u2 = jax.random.uniform(jax.random.fold_in(k_i, 1), (n,))
        step = -jnp.log1p(-jnp.minimum(u1, 1.0 - 1e-7)) / jnp.maximum(maj, 1e-12)
        t_new = t + step
        escaped = t_new >= t_surf
        p = ro + t_new[:, None] * rd
        dens = density_at(scene, med_id, p)
        real = u2 < dens * sigma_bar / jnp.maximum(maj, 1e-12)
        fresh = ~done
        t = jnp.where(fresh, jnp.minimum(t_new, t_surf), t)
        scattered = scattered | (fresh & ~escaped & real)
        done = done | escaped | (fresh & ~escaped & real)
        return t, done, scattered

    t0 = jnp.zeros(n)
    done0 = ~in_medium
    sc0 = jnp.zeros(n, bool)
    t, done, scattered = jax.lax.fori_loop(0, max_steps, body, (t0, done0, sc0))
    t = jnp.where(in_medium, jnp.where(done, t, t_surf), t_surf)
    # Gray tracking: the free-flight pdf cancels the transmittance exactly,
    # leaving albedo on scatter and 1 on escape. Spectral sigma_t collapses
    # to its channel mean for heterogeneous media (the reference's
    # heterogeneous.cpp is likewise single-channel density-driven).
    albedo = scene.med_albedo[med_id]
    w = jnp.where(scattered[:, None], albedo, 1.0)
    w = jnp.where(in_medium[:, None], w, 1.0)
    return {"t": t, "scattered": scattered & in_medium, "weight": w}


def transmittance_hetero(scene, med_id: jnp.ndarray, key, ro, rd,
                         dist: jnp.ndarray, max_steps: int = 64) -> jnp.ndarray:
    """Unbiased binary transmittance estimate along a shadow segment via
    delta tracking (1 survives, 0 absorbed), gray; homogeneous rows use
    the analytic curve."""
    hs = sample_distance_hetero(scene, med_id, key, ro, rd, dist, max_steps)
    vol = scene.med_vol[med_id]
    analytic = transmittance(scene, med_id, dist)
    binary = jnp.where(hs["scattered"][:, None], 0.0, 1.0)
    return jnp.where((vol >= 0)[:, None], binary, analytic)


def transmittance(scene, med_id: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """e^{-sigma_t · d} per channel along the ray's current medium.

    Approximation: shadow rays attenuate through the *current* medium for
    the whole segment; medium boundaries along the shadow path are not
    marched (the reference's sampleAttenuatedEmitterDirect walks them)."""
    return jnp.exp(-scene.med_sigma_t[med_id] * dist[:, None])


def update_medium(scene, med_id, tri, wi_dot_geo, wo_dot_geo, crossed_mask):
    """New medium id after a surface event: transmission through a boundary
    switches to the triangle's interior (entering, wo·ng < 0) or exterior
    (exiting). Reflection keeps the current medium."""
    crossing = crossed_mask & (wi_dot_geo * wo_dot_geo < 0.0)
    tri_safe = jnp.maximum(tri, 0)
    inside = scene.tri_medium[tri_safe]
    outside = scene.tri_medium_ext[tri_safe]
    new_id = jnp.where(wo_dot_geo < 0.0, inside, outside)
    return jnp.where(crossing, new_id, med_id)


def hg_pdf(g, cos_theta):
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * jnp.pi * jnp.power(jnp.maximum(denom, 1e-8), 1.5))


def hg_sample(g, wi: jnp.ndarray, u: jnp.ndarray):
    """Sample a direction about the current propagation direction ``wi``."""
    g = jnp.broadcast_to(g, u[..., 0].shape)
    iso = jnp.abs(g) < 1e-3
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u[..., 0] + 1e-12)
    two_g = jnp.where(jnp.abs(g) > 1e-6, 2.0 * g, 1e-6)  # sign-preserving
    cos_t = jnp.where(
        iso,
        1.0 - 2.0 * u[..., 0],
        (1.0 + g * g - sqr * sqr) / two_g,
    )
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    s, t = coordinate_system(wi)
    d = to_world(s, t, wi, local)
    pdf = hg_pdf(g, cos_t)
    return d, pdf
