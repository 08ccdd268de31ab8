"""Fresnel terms (dielectric exact, conductor with complex IOR).

Reference equivalents: fresnelDielectricExt / fresnelConductorExact in
mitsuba/src/libcore/util.cpp.
"""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_i: jnp.ndarray, eta: jnp.ndarray):
    """Exact dielectric Fresnel.

    Returns (F, cos_t, eta_it, eta_ti). ``eta`` = int/ext IOR ratio;
    handles both directions via the sign of cos_i.
    """
    outside = cos_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)
    cos_t2 = 1.0 - eta_ti * eta_ti * (1.0 - cos_i * cos_i)
    abs_cos_i = jnp.abs(cos_i)
    cos_t = jnp.sqrt(jnp.maximum(cos_t2, 0.0))
    rs = (abs_cos_i - eta_it * cos_t) / jnp.maximum(abs_cos_i + eta_it * cos_t, 1e-12)
    rp = (eta_it * abs_cos_i - cos_t) / jnp.maximum(eta_it * abs_cos_i + cos_t, 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    f = jnp.where(cos_t2 <= 0.0, 1.0, f)  # TIR
    cos_t = jnp.where(cos_t2 <= 0.0, 0.0, -jnp.sign(cos_i) * cos_t)
    return f, cos_t, eta_it, eta_ti


def fresnel_conductor(cos_i: jnp.ndarray, eta: jnp.ndarray, k: jnp.ndarray):
    """Unpolarized conductor Fresnel; eta, k may be [..., 3] RGB."""
    c2 = (cos_i * cos_i)[..., None]
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * jnp.abs(cos_i)[..., None]
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)
