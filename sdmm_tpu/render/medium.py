"""Homogeneous participating medium + Henyey-Greenstein phase function.

TPU-native equivalent of the reference's medium/phase plugins
(reference: mitsuba/src/medium/homogeneous.cpp, mitsuba/src/phase/hg.cpp)
used by the volumetric path tracer. Distance sampling uses the mean
extinction as the sampling density with per-channel transmittance
reweighting; all functions are batched and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import coordinate_system, to_world


def sample_distance(scene, u: jnp.ndarray, t_surf: jnp.ndarray):
    """Sample a free-flight distance against mean extinction.

    Returns dict(t, scattered [bool], weight [N,3]) where weight is the
    per-channel transmittance / pdf ratio for the chosen event (medium
    scatter at t, or reaching the surface at t_surf).
    """
    sigma_t = scene.med_sigma_t  # [3]
    sigma_bar = jnp.maximum(jnp.mean(sigma_t), 1e-8)
    t_med = -jnp.log1p(-jnp.minimum(u, 1.0 - 1e-7)) / sigma_bar
    scattered = t_med < t_surf
    t = jnp.where(scattered, t_med, t_surf)
    # Medium event: weight = sigma_s·e^{-sigma_t t} / (sigma_bar·e^{-sigma_bar t})
    tr = jnp.exp(-sigma_t[None, :] * t[:, None])
    pdf_med = sigma_bar * jnp.exp(-sigma_bar * t)
    pdf_surf = jnp.exp(-sigma_bar * t)
    sigma_s = sigma_t * scene.med_albedo
    w_med = sigma_s[None, :] * tr / jnp.maximum(pdf_med, 1e-30)[:, None]
    w_surf = tr / jnp.maximum(pdf_surf, 1e-30)[:, None]
    weight = jnp.where(scattered[:, None], w_med, w_surf)
    return {"t": t, "scattered": scattered, "weight": weight}


def transmittance(scene, dist: jnp.ndarray) -> jnp.ndarray:
    """e^{-sigma_t · d} per channel; [N] → [N,3]."""
    return jnp.exp(-scene.med_sigma_t[None, :] * dist[:, None])


def hg_pdf(g, cos_theta):
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * jnp.pi * jnp.power(jnp.maximum(denom, 1e-8), 1.5))


def hg_sample(g, wi: jnp.ndarray, u: jnp.ndarray):
    """Sample a direction around -wi? Convention: returns new propagation
    direction given current direction ``wd`` (the ray direction), HG is
    defined about the forward direction."""
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
