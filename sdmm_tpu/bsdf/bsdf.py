"""Wavefront BSDF dispatch: eval / pdf / sample over ray batches.

TPU-native replacement for the reference's virtual BSDF plugin dispatch
(reference: mitsuba/include/mitsuba/render/bsdf.h BSDF::sample/eval/pdf and
plugin implementations mitsuba/src/bsdfs/{diffuse,conductor,dielectric,
roughconductor,phong}.cpp). Instead of per-ray virtual calls, every model is
evaluated on the whole batch in the local shading frame and the result is
selected by type mask — branchless wavefront shading.

Conventions: directions in the local shading frame (z = normal), wi points
away from the surface toward the previous vertex, wi.z > 0 for reflective
models (callers flip the frame; dielectrics see both signs). ``eval``
returns f·|cos θo| (the reference folds the cosine into eval as well).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.frame import reflect, normalize
from ..core.spectrum import luminance
from ..scene.scene import (
    BSDF_CONDUCTOR,
    BSDF_DIELECTRIC,
    BSDF_DIFFUSE,
    BSDF_NULL,
    BSDF_PHONG,
    BSDF_ROUGHCONDUCTOR,
)
from . import microfacet as mf
from .fresnel import fresnel_conductor, fresnel_dielectric

INV_PI = 1.0 / jnp.pi


def gather_params(scene, bsdf_idx: jnp.ndarray) -> dict:
    """Gather per-ray BSDF parameters from the scene table."""
    return {
        "type": scene.bsdf_type[bsdf_idx],
        "albedo": scene.bsdf_albedo[bsdf_idx],
        "specular": scene.bsdf_specular[bsdf_idx],
        "alpha": scene.bsdf_alpha[bsdf_idx],
        "eta": scene.bsdf_eta[bsdf_idx],
        "k": scene.bsdf_k[bsdf_idx],
        "exponent": scene.bsdf_exponent[bsdf_idx],
    }


def is_delta_only(params: dict) -> jnp.ndarray:
    """True where the BSDF has only delta lobes (no smooth component)."""
    t = params["type"]
    return (t == BSDF_CONDUCTOR) | (t == BSDF_DIELECTRIC) | (t == BSDF_NULL)


def has_smooth(params: dict) -> jnp.ndarray:
    return ~is_delta_only(params)


def _phong_lobe_probs(params):
    kd = luminance(params["albedo"])
    ks = luminance(params["specular"])
    total = jnp.maximum(kd + ks, 1e-12)
    return kd / total, ks / total


def eval_pdf(params: dict, wi: jnp.ndarray, wo: jnp.ndarray):
    """Smooth-lobe (f·cosθo, pdf). Delta lobes contribute zero."""
    t = params["type"]
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    front = (cos_i > 1e-6) & (cos_o > 1e-6)

    # Diffuse (reference: bsdfs/diffuse.cpp).
    f_diff = params["albedo"] * (INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)

    # Rough conductor, GGX + Smith (reference: bsdfs/roughconductor.cpp).
    h = normalize(wi + wo)
    alpha = params["alpha"]
    d = mf.ggx_ndf(h, alpha)
    g = mf.smith_g1(wi, h, alpha) * mf.smith_g1(wo, h, alpha)
    f_cond = fresnel_conductor(jnp.sum(wi * h, axis=-1), params["eta"][..., None], params["k"])
    spec = params["specular"] * f_cond
    f_rc = spec * (d * g / jnp.maximum(4.0 * cos_i, 1e-12))[..., None]
    pdf_rc = mf.vndf_pdf(wi, h, alpha) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo * h, axis=-1)), 1e-12
    )

    # Modified Phong (reference: bsdfs/phong.cpp).
    refl = reflect(wi)
    cos_a = jnp.maximum(jnp.sum(refl * wo, axis=-1), 0.0)
    n_exp = params["exponent"]
    spec_lobe = (n_exp + 2.0) * (0.5 * INV_PI) * jnp.power(cos_a, n_exp)
    f_ph = (
        params["albedo"] * (INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
        + params["specular"] * (spec_lobe * jnp.maximum(cos_o, 0.0))[..., None]
    )
    p_d, p_s = _phong_lobe_probs(params)
    pdf_ph = p_d * pdf_diff + p_s * (n_exp + 1.0) * (0.5 * INV_PI) * jnp.power(
        cos_a, n_exp
    )

    zero3 = jnp.zeros_like(f_diff)
    f = jnp.where((t == BSDF_DIFFUSE)[..., None], f_diff, zero3)
    f = jnp.where((t == BSDF_ROUGHCONDUCTOR)[..., None], f_rc, f)
    f = jnp.where((t == BSDF_PHONG)[..., None], f_ph, f)
    pdf = jnp.where(t == BSDF_DIFFUSE, pdf_diff, 0.0)
    pdf = jnp.where(t == BSDF_ROUGHCONDUCTOR, pdf_rc, pdf)
    pdf = jnp.where(t == BSDF_PHONG, pdf_ph, pdf)

    f = jnp.where(front[..., None], f, 0.0)
    pdf = jnp.where(front, pdf, 0.0)
    return f, pdf


def sample(params: dict, wi: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Sample an outgoing direction.

    Returns dict(wo, weight=f·cos/pdf, pdf, delta, eta). For delta lobes the
    pdf is the discrete branch probability and weight already folds it in.
    """
    t = params["type"]
    cos_i = wi[..., 2]

    # --- diffuse ---
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    w_diff = params["albedo"]
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo_diff)

    # --- smooth conductor ---
    wo_cond = reflect(wi)
    f_cond = fresnel_conductor(cos_i, params["eta"][..., None], params["k"])
    w_cond = params["specular"] * f_cond

    # --- smooth dielectric ---
    fr, cos_t, eta_it, eta_ti = fresnel_dielectric(cos_i, params["eta"])
    refl_choice = u1 < fr
    wo_refl = reflect(wi)
    # Refraction: Snell in local frame.
    wo_refr = jnp.stack(
        [-wi[..., 0] * eta_ti, -wi[..., 1] * eta_ti, cos_t], axis=-1
    )
    wo_diel = jnp.where(refl_choice[..., None], wo_refl, wo_refr)
    # Radiance transport: scale transmitted radiance by eta_ti^2.
    w_diel = jnp.where(
        refl_choice[..., None],
        params["specular"],
        params["albedo"] * (eta_ti * eta_ti)[..., None],
    )
    eta_diel = jnp.where(refl_choice, 1.0, eta_it)
    pdf_diel = jnp.where(refl_choice, fr, 1.0 - fr)

    # --- rough conductor (VNDF) ---
    alpha = params["alpha"]
    m = mf.sample_vndf(wi, alpha, u2)
    wo_rc = 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi
    f_m = fresnel_conductor(jnp.sum(wi * m, axis=-1), params["eta"][..., None], params["k"])
    g1o = mf.smith_g1(wo_rc, m, alpha)
    w_rc = params["specular"] * f_m * g1o[..., None]
    pdf_rc = mf.vndf_pdf(wi, m, alpha) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo_rc * m, axis=-1)), 1e-12
    )
    valid_rc = wo_rc[..., 2] > 1e-6
    w_rc = jnp.where(valid_rc[..., None], w_rc, 0.0)
    pdf_rc = jnp.where(valid_rc, pdf_rc, 0.0)

    # --- phong ---
    p_d, p_s = _phong_lobe_probs(params)
    pick_spec = u1 >= p_d
    n_exp = params["exponent"]
    # Power-cosine lobe around the reflection direction.
    cos_alpha = jnp.power(jnp.maximum(u2[..., 0], 1e-12), 1.0 / (n_exp + 1.0))
    sin_alpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_alpha * cos_alpha))
    phi = 2.0 * jnp.pi * u2[..., 1]
    lobe_local = jnp.stack(
        [sin_alpha * jnp.cos(phi), sin_alpha * jnp.sin(phi), cos_alpha], axis=-1
    )
    refl = reflect(wi)
    # Frame around reflection dir.
    from ..core.frame import coordinate_system, to_world

    s_ax, t_ax = coordinate_system(refl)
    wo_spec = to_world(s_ax, t_ax, refl, lobe_local)
    wo_ph = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
    f_ph, pdf_ph = eval_pdf({**params, "type": jnp.full_like(t, BSDF_PHONG)}, wi, wo_ph)
    w_ph = jnp.where(
        (pdf_ph > 0.0)[..., None], f_ph / jnp.maximum(pdf_ph, 1e-20)[..., None], 0.0
    )

    # --- select by type ---
    def sel3(vals):
        out = jnp.zeros_like(wo_diff)
        for code, v in vals:
            out = jnp.where((t == code)[..., None], v, out)
        return out

    def sel1(vals, default=0.0):
        out = jnp.full_like(cos_i, default)
        for code, v in vals:
            out = jnp.where(t == code, v, out)
        return out

    wo = sel3([
        (BSDF_DIFFUSE, wo_diff), (BSDF_CONDUCTOR, wo_cond),
        (BSDF_DIELECTRIC, wo_diel), (BSDF_ROUGHCONDUCTOR, wo_rc),
        (BSDF_PHONG, wo_ph),
    ])
    weight = sel3([
        (BSDF_DIFFUSE, w_diff), (BSDF_CONDUCTOR, w_cond),
        (BSDF_DIELECTRIC, w_diel), (BSDF_ROUGHCONDUCTOR, w_rc),
        (BSDF_PHONG, w_ph),
    ])
    pdf = sel1([
        (BSDF_DIFFUSE, pdf_diff), (BSDF_CONDUCTOR, jnp.ones_like(cos_i)),
        (BSDF_DIELECTRIC, pdf_diel), (BSDF_ROUGHCONDUCTOR, pdf_rc),
        (BSDF_PHONG, pdf_ph),
    ])
    delta = (t == BSDF_CONDUCTOR) | (t == BSDF_DIELECTRIC)
    eta = sel1([(BSDF_DIELECTRIC, eta_diel)], default=1.0)

    # Reflective models need wi on the front side.
    needs_front = (t != BSDF_DIELECTRIC) & (t != BSDF_NULL)
    ok = jnp.where(needs_front, cos_i > 1e-6, True)
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    return {"wo": wo, "weight": weight, "pdf": pdf, "delta": delta, "eta": eta}
