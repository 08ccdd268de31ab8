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
    BSDF_BLEND,
    BSDF_COATING,
    BSDF_CONDUCTOR,
    BSDF_DIELECTRIC,
    BSDF_DIFFTRANS,
    BSDF_HK,
    BSDF_IRAWAN,
    BSDF_DIFFUSE,
    BSDF_MASK,
    BSDF_NULL,
    BSDF_PHONG,
    BSDF_PLASTIC,
    BSDF_ROUGHCONDUCTOR,
    BSDF_ROUGHDIELECTRIC,
    BSDF_ROUGHDIFFUSE,
    BSDF_ROUGHPLASTIC,
    BSDF_THINDIELECTRIC,
    BSDF_WARD,
)
from . import microfacet as mf
from .fresnel import fresnel_conductor, fresnel_dielectric

INV_PI = 1.0 / jnp.pi


def _fresnel_diffuse_reflectance(eta):
    """Average Fresnel reflectance for diffuse internal scattering
    (reference: fresnelDiffuseReflectance in libcore/util.cpp, used by
    plastic/roughplastic). Polynomial fit for eta > 1."""
    inv_eta = 1.0 / eta
    return jnp.where(
        eta > 1.0,
        -1.4399 * inv_eta * inv_eta
        + 0.7099 * inv_eta
        + 0.6681
        + 0.0636 * eta,
        0.0636 * inv_eta
        + 0.6681
        + 0.7099 * eta
        - 1.4399 * eta * eta,
    )


def _gather_raw(scene, bsdf_idx: jnp.ndarray, uv: jnp.ndarray | None = None) -> dict:
    """Gather one row of per-ray BSDF parameters (no child resolution)."""
    albedo = scene.bsdf_albedo[bsdf_idx]
    if uv is not None and scene.textures.shape[1] > 1:
        tex_id = scene.bsdf_tex[bsdf_idx]
        albedo = jnp.where(
            (tex_id >= 0)[..., None],
            sample_texture(scene.textures, jnp.maximum(tex_id, 0), uv),
            albedo,
        )
    if uv is not None and scene.proc_tex.shape[0] > 0:
        tex_id = scene.bsdf_tex[bsdf_idx]
        is_proc = tex_id <= -2
        albedo = jnp.where(
            is_proc[..., None],
            eval_proc_texture(
                scene, jnp.where(is_proc, -tex_id - 2, 0), uv),
            albedo,
        )
    return {
        "type": scene.bsdf_type[bsdf_idx],
        "albedo": albedo,
        "specular": scene.bsdf_specular[bsdf_idx],
        "alpha": scene.bsdf_alpha[bsdf_idx],
        "alpha_v": scene.bsdf_alpha_v[bsdf_idx],
        "eta": scene.bsdf_eta[bsdf_idx],
        "k": scene.bsdf_k[bsdf_idx],
        "exponent": scene.bsdf_exponent[bsdf_idx],
    }


def _where_params(mask, a: dict, b: dict) -> dict:
    """Per-field select between two parameter dicts (keys missing from ``a``
    pass through from ``b``)."""
    out = {}
    for k in b:
        if k not in a:
            out[k] = b[k]
            continue
        av, bv = a[k], b[k]
        if not hasattr(bv, "ndim"):  # non-array payloads (e.g. weave tables)
            out[k] = bv
            continue
        out[k] = jnp.where(mask[..., None] if bv.ndim > mask.ndim else mask, av, bv)
    return out


def gather_params(scene, bsdf_idx: jnp.ndarray, uv: jnp.ndarray | None = None,
                  types: tuple | None = None) -> dict:
    """Gather per-ray BSDF parameters from the scene table.

    When ``uv`` is given and the BSDF carries a texture id, the albedo is
    replaced by a bilinear texture lookup (reference: bitmap texture
    plugin, mitsuba/src/textures/bitmap.cpp).

    Container BSDFs are resolved here (reference: bsdfs/{mask,blendbsdf}.cpp
    forward to nested BSDFs): a ``mask`` row substitutes its child's
    parameters and records the opacity; a ``blend`` row substitutes child0
    and attaches child1's parameters + the blend factor. Children must be
    plain (non-container) BSDFs. ``types`` (static) compiles the container
    machinery out of scenes that lack it.
    """

    def has(code):
        return types is None or code in types

    p = _gather_raw(scene, bsdf_idx, uv)
    if has(BSDF_MASK):
        is_mask = p["type"] == BSDF_MASK
        child = jnp.where(is_mask, scene.bsdf_child0[bsdf_idx], bsdf_idx)
        c = _gather_raw(scene, jnp.maximum(child, 0), uv)
        opacity = jnp.clip(p["albedo"], 0.0, 1.0)  # mask opacity lives in albedo
        p = _where_params(is_mask, c, p)
        p["is_mask"] = is_mask
        p["opacity"] = jnp.where(is_mask[..., None], opacity, 1.0)
    if has(BSDF_COATING):
        # Smooth dielectric coating over a child (reference:
        # bsdfs/coating.cpp). Parent row columns: eta = layer IOR ratio,
        # alpha = thickness, albedo = sigmaA, specular = specularReflectance.
        is_coat = p["type"] == BSDF_COATING
        child = jnp.where(is_coat, scene.bsdf_child0[bsdf_idx], bsdf_idx)
        c = _gather_raw(scene, jnp.maximum(child, 0), uv)
        coat_eta = p["eta"]
        coat_sa = p["albedo"] * p["alpha"][..., None]  # sigmaA * thickness
        coat_spec = p["specular"]
        coat_alpha = p["alpha_v"]  # GGX roughness of the boundary (0 = smooth)
        p = _where_params(is_coat, c, p)
        p["is_coat"] = is_coat
        p["coat_eta"] = jnp.where(is_coat, coat_eta, 1.5)
        p["coat_alpha"] = jnp.where(is_coat, coat_alpha, 0.0)
        p["coat_sa"] = jnp.where(is_coat[..., None], coat_sa, 0.0)
        p["coat_spec"] = jnp.where(is_coat[..., None], coat_spec, 1.0)
    if has(BSDF_BLEND):
        is_blend = p["type"] == BSDF_BLEND
        c0 = jnp.where(is_blend, scene.bsdf_child0[bsdf_idx], bsdf_idx)
        c1 = jnp.where(is_blend, scene.bsdf_child1[bsdf_idx], bsdf_idx)
        pa = _gather_raw(scene, jnp.maximum(c0, 0), uv)
        pb = _gather_raw(scene, jnp.maximum(c1, 0), uv)
        p = _where_params(is_blend, pa, p)
        p["is_blend"] = is_blend
        p["blend_b"] = pb
        p["blend_w"] = jnp.where(is_blend, scene.bsdf_weight[bsdf_idx], 0.0)
    if has(BSDF_IRAWAN):
        # Woven cloth needs the raw hit UV and the scene's weave tables
        # (reference: bsdfs/irawan.cpp eval uses its.uv).
        p["iw"] = {
            "pattern": scene.iw_pattern, "yarns": scene.iw_yarns,
            "kd": scene.iw_kd, "ks": scene.iw_ks, "consts": scene.iw_consts,
        }
        p["uv"] = uv if uv is not None else jnp.zeros(
            bsdf_idx.shape + (2,)
        )
    return p


def eval_proc_texture(scene, pidx: jnp.ndarray, uv: jnp.ndarray):
    """Branchless procedural texture eval over the wave.

    TPU-native rebirth of the reference's virtual Texture::eval for the
    procedural plugins (src/textures/{checkerboard.cpp:66,
    gridtexture.cpp:76, wireframe.cpp:81, vertexcolors.cpp:56,
    curvature.cpp:83}): every kind is evaluated on the whole batch and
    selected by the per-ray kind code. ``uv`` may be the widened [N, 6]
    row from surface_interaction (channels 2:5 = interpolated vertex
    colors, 5 = distance to the nearest triangle edge); plain [N, 2] rows
    degrade mesh-attribute kinds to black.
    """
    rows = scene.proc_tex[pidx]  # [N, 13]
    kind = rows[..., 0]
    c0 = rows[..., 1:4]
    c1 = rows[..., 4:7]
    # Texture2D uv transform (reference: include/mitsuba/render/texture.h).
    uu = uv[..., 0] * rows[..., 7] + rows[..., 9]
    vv = uv[..., 1] * rows[..., 8] + rows[..., 10]
    lw = rows[..., 11]
    sw = rows[..., 12]

    # checkerboard.cpp:66 — int-cast truncates toward zero.
    cx = jnp.trunc(uu * 2.0).astype(jnp.int32) % 2
    cy = jnp.trunc(vv * 2.0).astype(jnp.int32) % 2
    checker = jnp.where(
        ((2 * cx - 1) * (2 * cy - 1) == 1)[..., None], c0, c1)

    # gridtexture.cpp:76 — lines of width lw at integer uv lines.
    gx = uu - jnp.floor(uu)
    gy = vv - jnp.floor(vv)
    gx = jnp.where(gx > 0.5, gx - 1.0, gx)
    gy = jnp.where(gy > 0.5, gy - 1.0, gy)
    on_line = (jnp.abs(gx) < lw) | (jnp.abs(gy) < lw)
    grid = jnp.where(on_line[..., None], c1, c0)

    if uv.shape[-1] >= 6:
        meshattr = uv[..., 2:5]
        # wireframe.cpp:121 — smoothstep between edge and interior color.
        t = jnp.clip(
            (uv[..., 5] - lw * (1.0 - sw)) / jnp.maximum(lw * sw, 1e-20),
            0.0, 1.0)
        a = t * t * (3.0 - 2.0 * t)
        wire = c0 * (1.0 - a[..., None]) + c1 * a[..., None]
    else:
        meshattr = jnp.zeros_like(c0)
        wire = c1

    out = jnp.where((kind == 0)[..., None], checker, grid)
    out = jnp.where((kind == 2)[..., None], meshattr, out)
    out = jnp.where((kind == 3)[..., None], wire, out)
    return out


def sample_texture(textures: jnp.ndarray, tex_id: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear sample from the [NT, R, R, 3] texture stack (uv wraps)."""
    r = textures.shape[1]
    u = (uv[..., 0] % 1.0) * r - 0.5
    # Mitsuba's v axis points up; image rows go down.
    v = ((1.0 - uv[..., 1]) % 1.0) * r - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, r - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, r - 1)
    x1i = jnp.clip(x0i + 1, 0, r - 1)
    y1i = jnp.clip(y0i + 1, 0, r - 1)
    c00 = textures[tex_id, y0i, x0i]
    c01 = textures[tex_id, y0i, x1i]
    c10 = textures[tex_id, y1i, x0i]
    c11 = textures[tex_id, y1i, x1i]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def is_delta_only(params: dict) -> jnp.ndarray:
    """True where the BSDF has only delta lobes (no smooth component)."""

    def _delta(t):
        return (
            (t == BSDF_CONDUCTOR) | (t == BSDF_DIELECTRIC)
            | (t == BSDF_NULL) | (t == BSDF_THINDIELECTRIC)
        )

    d = _delta(params["type"])
    if "blend_b" in params:
        # A blend is smooth if either child is.
        d = jnp.where(params["is_blend"], d & _delta(params["blend_b"]["type"]), d)
    return d


def has_smooth(params: dict) -> jnp.ndarray:
    return ~is_delta_only(params)


def _phong_lobe_probs(params):
    kd = luminance(params["albedo"])
    ks = luminance(params["specular"])
    total = jnp.maximum(kd + ks, 1e-12)
    return kd / total, ks / total


def _plastic_probs(params, cos_i):
    """Specular-lobe selection probability for (rough)plastic
    (reference: bsdfs/plastic.cpp specularSamplingWeight logic)."""
    f_i, _, _, _ = fresnel_dielectric(cos_i, params["eta"])
    w_s = luminance(params["specular"])
    w_d = luminance(params["albedo"])
    p = (f_i * w_s) / jnp.maximum(f_i * w_s + (1.0 - f_i) * w_d, 1e-12)
    return jnp.clip(p, 0.05, 0.95), f_i


def _plastic_diffuse(params, cos_i, cos_o):
    """Internal-scattering-corrected diffuse term shared by plastic /
    roughplastic (reference: bsdfs/{plastic,roughplastic}.cpp)."""
    eta = params["eta"]
    f_i, _, _, _ = fresnel_dielectric(cos_i, eta)
    f_o, _, _, _ = fresnel_dielectric(cos_o, eta)
    fdr = _fresnel_diffuse_reflectance(eta)
    inv_eta2 = 1.0 / (eta * eta)
    albedo = params["albedo"]
    denom = 1.0 - albedo * fdr[..., None]
    f = (
        albedo
        * ((1.0 - f_i) * (1.0 - f_o) * inv_eta2 * INV_PI * jnp.maximum(cos_o, 0.0))[
            ..., None
        ]
        / jnp.maximum(denom, 1e-6)
    )
    return f


def _ward_half_pdf(params, h):
    """Ward half-vector density over the hemisphere (normalized):
    exp(-tan^2 θ_h (cos^2 φ/αu^2 + sin^2 φ/αv^2)) / (π αu αv cos^3 θ_h)."""
    au = params["alpha"]
    av = params["alpha_v"]
    hz2 = jnp.maximum(h[..., 2] * h[..., 2], 1e-12)
    expo = -(
        (h[..., 0] / au) ** 2 + (h[..., 1] / av) ** 2
    ) / hz2
    cos3 = jnp.maximum(h[..., 2], 1e-6) ** 3
    return jnp.exp(expo) / (jnp.pi * au * av * cos3)


def _ward_lobe_probs(params):
    kd = luminance(params["albedo"])
    ks = luminance(params["specular"])
    total = jnp.maximum(kd + ks, 1e-12)
    return kd / total, ks / total


def _eval_pdf_ward(params, wi, wo, pdf_diff):
    """Anisotropic Ward BRDF (reference: bsdfs/ward.cpp, 'ward' variant):
    f_spec = ks · exp(·)/(4π αu αv sqrt(cos_i cos_o))."""
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    h = normalize(wi + wo)
    au = params["alpha"]
    av = params["alpha_v"]
    hz2 = jnp.maximum(h[..., 2] * h[..., 2], 1e-12)
    expo = -((h[..., 0] / au) ** 2 + (h[..., 1] / av) ** 2) / hz2
    denom = 4.0 * jnp.pi * au * av * jnp.sqrt(jnp.maximum(cos_i * cos_o, 1e-12))
    spec = jnp.exp(expo) / denom
    f = (
        params["albedo"] * (INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
        + params["specular"] * (spec * jnp.maximum(cos_o, 0.0))[..., None]
    )
    p_d, p_s = _ward_lobe_probs(params)
    pdf_spec = _ward_half_pdf(params, h) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(h * wo, axis=-1)), 1e-12
    )
    pdf = p_d * pdf_diff + p_s * pdf_spec
    return f, pdf


def _eval_pdf_roughdielectric(params, wi, wo):
    """Walter et al. 2007 rough dielectric with VNDF pdf; two-sided."""
    eta = params["eta"]
    alpha = params["alpha"]
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    reflecting = cos_i * cos_o > 0.0
    outside = cos_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)

    # Half vector: reflection → normalize(wi+wo); refraction →
    # -normalize(wi + eta_it·wo) (Walter eq. 16).
    h_refl = wi + wo
    h_refr = wi + wo * eta_it[..., None]
    h = jnp.where(reflecting[..., None], h_refl, h_refr)
    h = normalize(h)
    # Orient h to the upper hemisphere.
    h = h * jnp.sign(h[..., 2:3])

    d = mf.ggx_ndf(h, alpha)
    # Evaluate G with directions mapped above the surface for Smith.
    wi_u = wi * jnp.sign(cos_i)[..., None]
    wo_u = wo * jnp.sign(cos_o)[..., None]
    g = mf.smith_g1(wi_u, h, alpha) * mf.smith_g1(wo_u, h, alpha)
    idoth = jnp.sum(wi * h, axis=-1)
    odoth = jnp.sum(wo * h, axis=-1)
    f, _, _, _ = fresnel_dielectric(idoth, eta)

    # Reflection branch.
    f_refl = params["specular"] * (
        f * d * g / jnp.maximum(4.0 * jnp.abs(cos_i), 1e-12)
    )[..., None]
    # Refraction branch (radiance transport: × 1/eta_it²).
    sqrt_den = idoth + eta_it * odoth
    refr_fac = (
        jnp.abs(idoth * odoth)
        * (1.0 - f)
        * d
        * g
        / jnp.maximum(jnp.abs(cos_i) * sqrt_den * sqrt_den, 1e-12)
    ) / (eta_it * eta_it)
    f_refr = params["albedo"] * refr_fac[..., None]
    # |cos_o| is already folded: Walter's reflection term F·D·G/(4|ci||co|)
    # and refraction term both carry 1/|co| which cancels against eval's
    # ·|cos_o| convention.
    fval = jnp.where(reflecting[..., None], f_refl, f_refr)

    # Microfacet sidedness (Walter 2007 χ⁺ factors): the facet must see wi
    # (wi·h on wi's geometric side) and refraction needs wi/wo on opposite
    # sides of the facet. Without these, shallow transmission directions
    # get phantom pdf mass the sampler never produces.
    sees_wi = idoth * cos_i > 0.0
    side_ok = jnp.where(reflecting, idoth * odoth > 0.0, idoth * odoth < 0.0)
    geom_ok = sees_wi & side_ok

    # pdf: VNDF density of h × half-vector→wo Jacobian × branch prob F.
    pdf_h = mf.vndf_pdf(wi_u, h, alpha)
    jac_refl = 1.0 / jnp.maximum(4.0 * jnp.abs(odoth), 1e-12)
    jac_refr = (eta_it * eta_it) * jnp.abs(odoth) / jnp.maximum(
        sqrt_den * sqrt_den, 1e-12
    )
    pdf = pdf_h * jnp.where(
        reflecting, f * jac_refl, (1.0 - f) * jac_refr
    )
    ok = (jnp.abs(cos_i) > 1e-6) & geom_ok
    return jnp.where(ok[..., None], fval, 0.0), jnp.where(ok, pdf, 0.0)


def eval_pdf(params: dict, wi: jnp.ndarray, wo: jnp.ndarray,
             types: tuple | None = None):
    """Smooth-lobe (f·cosθo, pdf). Delta lobes contribute zero.

    ``types``: static tuple of BSDF codes present in the scene — absent
    models are compiled out entirely (wavefront shading evaluates all
    *present* models and mask-selects; this keeps single-material scenes at
    single-model cost).
    """
    t = params["type"]
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    front = (cos_i > 1e-6) & (cos_o > 1e-6)

    def has(code):
        return types is None or code in types

    sels_f: list = []
    sels_p: list = []

    need_cosine = (
        has(BSDF_DIFFUSE) or has(BSDF_PHONG) or has(BSDF_ROUGHPLASTIC)
        or has(BSDF_PLASTIC) or has(BSDF_WARD) or has(BSDF_ROUGHDIFFUSE)
        or has(BSDF_IRAWAN)
    )
    if need_cosine:
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)

    if has(BSDF_IRAWAN) and "iw" in params:
        # Woven cloth (reference: bsdfs/irawan.cpp eval/pdf — cosine pdf).
        from .irawan import eval_irawan

        f_iw = eval_irawan(params["iw"], params["uv"], wi, wo)
        sels_f.append((BSDF_IRAWAN, f_iw))
        sels_p.append((BSDF_IRAWAN, pdf_diff))

    if has(BSDF_WARD):
        f_w, pdf_w = _eval_pdf_ward(params, wi, wo, pdf_diff)
        sels_f.append((BSDF_WARD, f_w))
        sels_p.append((BSDF_WARD, pdf_w))

    if has(BSDF_DIFFUSE):
        # Diffuse (reference: bsdfs/diffuse.cpp).
        f_diff = params["albedo"] * (INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
        sels_f.append((BSDF_DIFFUSE, f_diff))
        sels_p.append((BSDF_DIFFUSE, pdf_diff))

    if has(BSDF_ROUGHDIFFUSE):
        # Oren-Nayar qualitative model (reference: bsdfs/roughdiffuse.cpp,
        # useFastApprox path); sigma (radians) is carried in `alpha`.
        sig2 = params["alpha"] * params["alpha"]
        a_on = 1.0 - sig2 / (2.0 * (sig2 + 0.33))
        b_on = 0.45 * sig2 / (sig2 + 0.66)
        s_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
        s_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
        sin_prod = s_i * s_o
        cos_phi_d = jnp.where(
            sin_prod > 1e-8,
            (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
            / jnp.maximum(sin_prod, 1e-8),
            0.0,
        )
        term = sin_prod / jnp.maximum(jnp.maximum(cos_i, cos_o), 1e-6)
        f_on = params["albedo"] * (
            INV_PI * jnp.maximum(cos_o, 0.0)
            * (a_on + b_on * jnp.maximum(cos_phi_d, 0.0) * term)
        )[..., None]
        sels_f.append((BSDF_ROUGHDIFFUSE, f_on))
        sels_p.append((BSDF_ROUGHDIFFUSE, pdf_diff))

    need_ggx = has(BSDF_ROUGHCONDUCTOR) or has(BSDF_ROUGHPLASTIC)
    if need_ggx:
        h = normalize(wi + wo)
        alpha = params["alpha"]
        d = mf.ggx_ndf(h, alpha)
        g = mf.smith_g1(wi, h, alpha) * mf.smith_g1(wo, h, alpha)
        pdf_rc = mf.vndf_pdf(wi, h, alpha) / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo * h, axis=-1)), 1e-12
        )

    if has(BSDF_ROUGHCONDUCTOR):
        # Rough conductor, GGX + Smith (reference: bsdfs/roughconductor.cpp).
        f_cond = fresnel_conductor(
            jnp.sum(wi * h, axis=-1), params["eta"][..., None], params["k"]
        )
        f_rc = (params["specular"] * f_cond) * (
            d * g / jnp.maximum(4.0 * cos_i, 1e-12)
        )[..., None]
        sels_f.append((BSDF_ROUGHCONDUCTOR, f_rc))
        sels_p.append((BSDF_ROUGHCONDUCTOR, pdf_rc))

    if has(BSDF_PHONG):
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
        sels_f.append((BSDF_PHONG, f_ph))
        sels_p.append((BSDF_PHONG, pdf_ph))

    if has(BSDF_ROUGHPLASTIC):
        # Rough plastic (reference: bsdfs/roughplastic.cpp).
        f_h, _, _, _ = fresnel_dielectric(jnp.sum(wi * h, axis=-1), params["eta"])
        f_rp = (
            params["specular"]
            * (f_h * d * g / jnp.maximum(4.0 * cos_i, 1e-12))[..., None]
            + _plastic_diffuse(params, cos_i, cos_o)
        )
        p_spec_rp, _ = _plastic_probs(params, cos_i)
        pdf_rp = p_spec_rp * pdf_rc + (1.0 - p_spec_rp) * pdf_diff
        sels_f.append((BSDF_ROUGHPLASTIC, f_rp))
        sels_p.append((BSDF_ROUGHPLASTIC, pdf_rp))

    if has(BSDF_PLASTIC):
        # Smooth plastic: only the diffuse lobe is smooth
        # (reference: bsdfs/plastic.cpp); the specular lobe is a delta.
        f_pl = _plastic_diffuse(params, cos_i, cos_o)
        p_spec_pl, _ = _plastic_probs(params, cos_i)
        pdf_pl = (1.0 - p_spec_pl) * pdf_diff
        sels_f.append((BSDF_PLASTIC, f_pl))
        sels_p.append((BSDF_PLASTIC, pdf_pl))

    zero3 = jnp.zeros(wi.shape[:-1] + (3,))
    zero1 = jnp.zeros(wi.shape[:-1])
    f = zero3
    pdf = zero1
    for code, val in sels_f:
        f = jnp.where((t == code)[..., None], val, f)
    for code, val in sels_p:
        pdf = jnp.where(t == code, val, pdf)

    f = jnp.where(front[..., None], f, 0.0)
    pdf = jnp.where(front, pdf, 0.0)

    if has(BSDF_ROUGHDIELECTRIC):
        # Rough dielectric is two-sided (its own masking), applied after the
        # front-hemisphere gate.
        f_rd, pdf_rd = _eval_pdf_roughdielectric(params, wi, wo)
        is_rd = t == BSDF_ROUGHDIELECTRIC
        f = jnp.where(is_rd[..., None], f_rd, f)
        pdf = jnp.where(is_rd, pdf_rd, pdf)

    if has(BSDF_DIFFTRANS):
        # Diffuse transmitter (reference: bsdfs/difftrans.cpp): wo in the
        # hemisphere OPPOSITE wi, Lambertian in |cos|. Applied after the
        # front gate since transmission fails the reflective check.
        trans = (cos_i > 1e-6) & (cos_o < -1e-6)
        f_dt = params["albedo"] * (INV_PI * jnp.maximum(-cos_o, 0.0))[..., None]
        pdf_dt = INV_PI * jnp.maximum(-cos_o, 0.0)
        is_dt = t == BSDF_DIFFTRANS
        f = jnp.where((is_dt & trans)[..., None], f_dt,
                      jnp.where(is_dt[..., None], 0.0, f))
        pdf = jnp.where(is_dt & trans, pdf_dt,
                        jnp.where(is_dt, 0.0, pdf))

    if has(BSDF_HK):
        # Hanrahan-Krueger single-scattering slab (reference: bsdfs/hk.cpp
        # eval, ESolidAngle branch). Two-sided + transmissive: applied
        # after the front gate with true cosine signs. Column mapping:
        # albedo = sigmaS, specular = sigmaA, alpha = thickness,
        # eta = HG phase g. The delta transmission lobe lives in sample()
        # (EDiscrete measure — excluded from solid-angle eval/pdf).
        f_hk, pdf_hk = _eval_pdf_hk(params, wi, wo, cos_i, cos_o)
        is_hk = t == BSDF_HK
        f = jnp.where(is_hk[..., None], f_hk, f)
        pdf = jnp.where(is_hk, pdf_hk, pdf)
    return f, pdf


def _hg_phase(g, wi, wo):
    """HG phase of the (wi, wo) away-facing pair (reference: phase/hg.cpp
    eval — 1+g^2+2g dot(wi,wo) with both directions pointing away)."""
    denom = 1.0 + g * g + 2.0 * g * jnp.sum(wi * wo, axis=-1)
    return (1.0 - g * g) / (
        4.0 * jnp.pi * jnp.power(jnp.maximum(denom, 1e-8), 1.5)
    )


def _hk_quantities(params, cos_i):
    sig_s = params["albedo"]
    sig_a = params["specular"]
    sig_t = sig_s + sig_a
    tau_d = sig_t * params["alpha"][..., None]
    alb = jnp.where(sig_t > 0.0, sig_s / jnp.maximum(sig_t, 1e-20), 0.0)
    aci = jnp.maximum(jnp.abs(cos_i), 1e-6)
    # Discrete unscattered-transmission probability: average over channels
    # of exp(-tauD/|cos_i|) (hk.cpp:326).
    p_spec = jnp.mean(jnp.exp(-tau_d / aci[..., None]), axis=-1)
    return tau_d, alb, aci, p_spec


def _eval_pdf_hk(params, wi, wo, cos_i, cos_o):
    tau_d, alb, aci, p_spec = _hk_quantities(params, cos_i)
    aco = jnp.maximum(jnp.abs(cos_o), 1e-6)
    g = params["eta"]
    phase = _hg_phase(g, wi, wo)
    dp = cos_i * cos_o
    refl = dp > 1e-9
    trans = dp < -1e-9

    f_r = alb * (phase * cos_i / jnp.where(
        jnp.abs(cos_i + cos_o) > 1e-6, cos_i + cos_o, 1e-6
    ))[..., None] * (
        1.0 - jnp.exp((-1.0 / aci - 1.0 / aco)[..., None] * tau_d)
    )
    near = jnp.abs(aci - aco) < 1e-5
    den = jnp.where(near, 1.0, aci - aco)
    f_t = alb * (phase * aci / den)[..., None] * (
        jnp.exp(-tau_d / aci[..., None]) - jnp.exp(-tau_d / aco[..., None])
    )
    f_t_lim = alb * phase[..., None] * (tau_d / aco[..., None]) * jnp.exp(
        -tau_d / aco[..., None]
    )
    f_t = jnp.where(near[..., None], f_t_lim, f_t)
    f = jnp.where(refl[..., None], f_r,
                  jnp.where(trans[..., None], f_t, 0.0)) * aco[..., None]
    # Sampled by the phase lobe, conditioned on not taking the delta
    # transmission (hk.cpp pdf:300-307).
    pdf = jnp.where(refl | trans, phase * (1.0 - p_spec), 0.0)
    return jnp.maximum(f, 0.0), jnp.maximum(pdf, 0.0)


def sample(params: dict, wi: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray,
           types: tuple | None = None):
    """Sample an outgoing direction.

    Returns dict(wo, weight=f·cos/pdf, pdf, delta, eta). For delta lobes the
    pdf is the discrete branch probability and weight already folds it in.
    ``types``: static tuple of BSDF codes present — see eval_pdf.
    """
    t = params["type"]
    cos_i = wi[..., 2]

    def has(code):
        return types is None or code in types

    wo_sel: list = []
    w_sel: list = []
    pdf_sel: list = []
    eta_sel: list = []
    delta = jnp.zeros(cos_i.shape, dtype=bool)

    need_cosine = (
        has(BSDF_DIFFUSE) or has(BSDF_PHONG) or has(BSDF_PLASTIC)
        or has(BSDF_ROUGHPLASTIC) or has(BSDF_WARD)
        or has(BSDF_ROUGHDIFFUSE) or has(BSDF_DIFFTRANS)
        or has(BSDF_IRAWAN)
    )
    if need_cosine:
        wo_diff = warp.square_to_cosine_hemisphere(u2)
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo_diff)

    if has(BSDF_IRAWAN) and "iw" in params:
        # Cosine-sampled (reference: irawan.cpp sample), weight = f / pdf.
        f_iw_s, pdf_iw_s = eval_pdf(
            {**params, "type": jnp.full_like(t, BSDF_IRAWAN)}, wi, wo_diff,
            types=(BSDF_IRAWAN,),
        )
        w_iw = jnp.where((pdf_iw_s > 0.0)[..., None],
                         f_iw_s / jnp.maximum(pdf_iw_s, 1e-20)[..., None],
                         0.0)
        wo_sel.append((BSDF_IRAWAN, wo_diff))
        w_sel.append((BSDF_IRAWAN, w_iw))
        pdf_sel.append((BSDF_IRAWAN, pdf_iw_s))

    if has(BSDF_ROUGHDIFFUSE):
        f_on, pdf_on = eval_pdf(
            {**params, "type": jnp.full_like(t, BSDF_ROUGHDIFFUSE)}, wi,
            wo_diff, types=(BSDF_ROUGHDIFFUSE,),
        )
        w_on = jnp.where((pdf_on > 0.0)[..., None],
                         f_on / jnp.maximum(pdf_on, 1e-20)[..., None], 0.0)
        wo_sel.append((BSDF_ROUGHDIFFUSE, wo_diff))
        w_sel.append((BSDF_ROUGHDIFFUSE, w_on))
        pdf_sel.append((BSDF_ROUGHDIFFUSE, pdf_on))

    if has(BSDF_DIFFTRANS):
        wo_dt = wo_diff * jnp.array([1.0, 1.0, -1.0])
        wo_sel.append((BSDF_DIFFTRANS, wo_dt))
        w_sel.append((BSDF_DIFFTRANS, params["albedo"]))
        pdf_sel.append((BSDF_DIFFTRANS, pdf_diff))

    if has(BSDF_DIFFUSE):
        wo_sel.append((BSDF_DIFFUSE, wo_diff))
        w_sel.append((BSDF_DIFFUSE, params["albedo"]))
        pdf_sel.append((BSDF_DIFFUSE, pdf_diff))

    if has(BSDF_NULL):
        # Null boundary: straight pass-through (reference: the 'null' BSDF
        # used for medium-only shapes).
        wo_sel.append((BSDF_NULL, -wi))
        w_sel.append((BSDF_NULL, jnp.ones(wi.shape[:-1] + (3,))))
        pdf_sel.append((BSDF_NULL, jnp.ones_like(cos_i)))
        delta = delta | (t == BSDF_NULL)
        passthrough = t == BSDF_NULL
    else:
        passthrough = jnp.zeros(cos_i.shape, dtype=bool)

    if has(BSDF_CONDUCTOR):
        wo_cond = reflect(wi)
        f_cond = fresnel_conductor(cos_i, params["eta"][..., None], params["k"])
        wo_sel.append((BSDF_CONDUCTOR, wo_cond))
        w_sel.append((BSDF_CONDUCTOR, params["specular"] * f_cond))
        pdf_sel.append((BSDF_CONDUCTOR, jnp.ones_like(cos_i)))
        delta = delta | (t == BSDF_CONDUCTOR)

    if has(BSDF_DIELECTRIC):
        fr, cos_t, eta_it, eta_ti = fresnel_dielectric(cos_i, params["eta"])
        refl_choice = u1 < fr
        wo_refl = reflect(wi)
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
        wo_sel.append((BSDF_DIELECTRIC, wo_diel))
        w_sel.append((BSDF_DIELECTRIC, w_diel))
        pdf_sel.append((BSDF_DIELECTRIC, jnp.where(refl_choice, fr, 1.0 - fr)))
        eta_sel.append((BSDF_DIELECTRIC, jnp.where(refl_choice, 1.0, eta_it)))
        delta = delta | (t == BSDF_DIELECTRIC)

    if has(BSDF_THINDIELECTRIC):
        # Thin dielectric slab (reference: bsdfs/thindielectric.cpp):
        # total reflectance includes internal bounces, R' = R + T²R/(1−R²);
        # transmission passes straight through (wo = −wi, no bend, no
        # radiance scaling since both interfaces cancel).
        fr0, _, _, _ = fresnel_dielectric(jnp.abs(cos_i), params["eta"])
        tr0 = 1.0 - fr0
        fr_thin = jnp.where(
            fr0 < 1.0,
            fr0 + tr0 * tr0 * fr0 / jnp.maximum(1.0 - fr0 * fr0, 1e-12),
            1.0,
        )
        refl_thin = u1 < fr_thin
        wo_thin = jnp.where(refl_thin[..., None], reflect(wi), -wi)
        w_thin = jnp.where(
            refl_thin[..., None], params["specular"], params["albedo"]
        )
        wo_sel.append((BSDF_THINDIELECTRIC, wo_thin))
        w_sel.append((BSDF_THINDIELECTRIC, w_thin))
        pdf_sel.append((
            BSDF_THINDIELECTRIC, jnp.where(refl_thin, fr_thin, 1.0 - fr_thin)
        ))
        delta = delta | (t == BSDF_THINDIELECTRIC)
        # Straight-through transmission crosses the geometric surface; skip
        # the sidedness cull like null pass-through does.
        passthrough = passthrough | ((t == BSDF_THINDIELECTRIC) & ~refl_thin)

    alpha = params["alpha"]
    if has(BSDF_ROUGHCONDUCTOR):
        m = mf.sample_vndf(wi, alpha, u2)
        wo_rc = 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi
        f_m = fresnel_conductor(
            jnp.sum(wi * m, axis=-1), params["eta"][..., None], params["k"]
        )
        g1o = mf.smith_g1(wo_rc, m, alpha)
        w_rc = params["specular"] * f_m * g1o[..., None]
        pdf_rc = mf.vndf_pdf(wi, m, alpha) / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo_rc * m, axis=-1)), 1e-12
        )
        valid_rc = wo_rc[..., 2] > 1e-6
        w_rc = jnp.where(valid_rc[..., None], w_rc, 0.0)
        pdf_rc = jnp.where(valid_rc, pdf_rc, 0.0)
        wo_sel.append((BSDF_ROUGHCONDUCTOR, wo_rc))
        w_sel.append((BSDF_ROUGHCONDUCTOR, w_rc))
        pdf_sel.append((BSDF_ROUGHCONDUCTOR, pdf_rc))

    if has(BSDF_PHONG):
        p_d, p_s = _phong_lobe_probs(params)
        pick_spec = u1 >= p_d
        n_exp = params["exponent"]
        cos_alpha = jnp.power(jnp.maximum(u2[..., 0], 1e-12), 1.0 / (n_exp + 1.0))
        sin_alpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_alpha * cos_alpha))
        phi = 2.0 * jnp.pi * u2[..., 1]
        lobe_local = jnp.stack(
            [sin_alpha * jnp.cos(phi), sin_alpha * jnp.sin(phi), cos_alpha], axis=-1
        )
        refl = reflect(wi)
        from ..core.frame import coordinate_system, to_world

        s_ax, t_ax = coordinate_system(refl)
        wo_spec = to_world(s_ax, t_ax, refl, lobe_local)
        wo_ph = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
        f_ph, pdf_ph = eval_pdf(
            {**params, "type": jnp.full_like(t, BSDF_PHONG)}, wi, wo_ph,
            types=(BSDF_PHONG,),
        )
        w_ph = jnp.where(
            (pdf_ph > 0.0)[..., None],
            f_ph / jnp.maximum(pdf_ph, 1e-20)[..., None], 0.0,
        )
        wo_sel.append((BSDF_PHONG, wo_ph))
        w_sel.append((BSDF_PHONG, w_ph))
        pdf_sel.append((BSDF_PHONG, pdf_ph))

    if has(BSDF_WARD):
        # Ward half-vector sampling (reference: bsdfs/ward.cpp sample):
        # φ_h from the anisotropic azimuth warp, tan²θ_h ~ Exp(k(φ)).
        p_d_w, p_s_w = _ward_lobe_probs(params)
        pick_spec_w = u1 >= p_d_w
        au = params["alpha"]
        av_ = params["alpha_v"]
        phi = jnp.arctan2(
            av_ * jnp.sin(2.0 * jnp.pi * u2[..., 1]),
            au * jnp.cos(2.0 * jnp.pi * u2[..., 1]),
        )
        cp = jnp.cos(phi)
        sp = jnp.sin(phi)
        kphi = cp * cp / (au * au) + sp * sp / (av_ * av_)
        tan2t = -jnp.log(jnp.maximum(u2[..., 0], 1e-9)) / jnp.maximum(kphi, 1e-12)
        cos_t = 1.0 / jnp.sqrt(1.0 + tan2t)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        h_w = jnp.stack([sin_t * cp, sin_t * sp, cos_t], axis=-1)
        wo_w_spec = 2.0 * jnp.sum(wi * h_w, axis=-1, keepdims=True) * h_w - wi
        wo_w = jnp.where(pick_spec_w[..., None], wo_w_spec, wo_diff)
        f_w_s, pdf_w_s = eval_pdf(
            {**params, "type": jnp.full_like(t, BSDF_WARD)}, wi, wo_w,
            types=(BSDF_WARD,),
        )
        w_w = jnp.where(
            (pdf_w_s > 0.0)[..., None],
            f_w_s / jnp.maximum(pdf_w_s, 1e-20)[..., None], 0.0,
        )
        wo_sel.append((BSDF_WARD, wo_w))
        w_sel.append((BSDF_WARD, w_w))
        pdf_sel.append((BSDF_WARD, pdf_w_s))

    if has(BSDF_ROUGHDIELECTRIC):
        # Walter + VNDF; see the eval for conventions. All signed cosines are
        # w.r.t. the upper-oriented facet normal.
        cos_sign = jnp.sign(cos_i)
        wi_u = wi * cos_sign[..., None]
        m_rd = mf.sample_vndf(wi_u, alpha, u2)
        idotm = jnp.sum(wi * m_rd, axis=-1)  # signed: negative when inside
        f_m, cos_t_m, eta_it_rd, eta_ti_rd = fresnel_dielectric(
            idotm, params["eta"]
        )
        pick_refl_rd = u1 < f_m
        wo_rd_refl = 2.0 * idotm[..., None] * m_rd - wi
        wo_rd_refr = (
            (eta_ti_rd * idotm - jnp.sign(idotm) * jnp.sqrt(
                jnp.maximum(
                    1.0 + eta_ti_rd * eta_ti_rd * (idotm * idotm - 1.0), 0.0
                )
            ))[..., None] * m_rd
            - eta_ti_rd[..., None] * wi
        )
        wo_rd = jnp.where(pick_refl_rd[..., None], wo_rd_refl, wo_rd_refr)
        wo_rd = normalize(wo_rd)
        wo_u_rd = wo_rd * jnp.sign(wo_rd[..., 2:3])
        g1o_rd = mf.smith_g1(wo_u_rd, m_rd, alpha)
        w_rd = jnp.where(
            pick_refl_rd[..., None],
            params["specular"] * g1o_rd[..., None],
            params["albedo"] * (g1o_rd / (eta_it_rd * eta_it_rd))[..., None],
        )
        good_side = jnp.where(
            pick_refl_rd, wo_rd[..., 2] * cos_i > 0.0, wo_rd[..., 2] * cos_i < 0.0
        )
        w_rd = jnp.where(good_side[..., None], w_rd, 0.0)
        _, pdf_rd_s = _eval_pdf_roughdielectric(params, wi, wo_rd)
        wo_sel.append((BSDF_ROUGHDIELECTRIC, wo_rd))
        w_sel.append((BSDF_ROUGHDIELECTRIC, w_rd))
        pdf_sel.append((BSDF_ROUGHDIELECTRIC, pdf_rd_s))
        eta_sel.append(
            (BSDF_ROUGHDIELECTRIC, jnp.where(pick_refl_rd, 1.0, eta_it_rd))
        )

    if has(BSDF_PLASTIC):
        p_spec_pl, f_i_pl = _plastic_probs(params, cos_i)
        pick_spec_pl = u1 < p_spec_pl
        wo_pl = jnp.where(pick_spec_pl[..., None], reflect(wi), wo_diff)
        w_pl_spec = params["specular"] * (
            f_i_pl / jnp.maximum(p_spec_pl, 1e-6)
        )[..., None]
        f_pl_d = _plastic_diffuse(params, cos_i, wo_pl[..., 2])
        pdf_pl_d = (1.0 - p_spec_pl) * warp.square_to_cosine_hemisphere_pdf(wo_pl)
        w_pl_diff = jnp.where(
            (pdf_pl_d > 0.0)[..., None],
            f_pl_d / jnp.maximum(pdf_pl_d, 1e-20)[..., None], 0.0,
        )
        w_pl = jnp.where(pick_spec_pl[..., None], w_pl_spec, w_pl_diff)
        wo_sel.append((BSDF_PLASTIC, wo_pl))
        w_sel.append((BSDF_PLASTIC, w_pl))
        pdf_sel.append((BSDF_PLASTIC, jnp.where(pick_spec_pl, p_spec_pl, pdf_pl_d)))
        delta = delta | ((t == BSDF_PLASTIC) & pick_spec_pl)

    if has(BSDF_ROUGHPLASTIC):
        p_spec_rp, _ = _plastic_probs(params, cos_i)
        pick_spec_rp = u1 < p_spec_rp
        m_rp = mf.sample_vndf(wi, alpha, u2)
        wo_rp_spec = 2.0 * jnp.sum(wi * m_rp, axis=-1, keepdims=True) * m_rp - wi
        wo_rp = jnp.where(pick_spec_rp[..., None], wo_rp_spec, wo_diff)
        f_rp_e, pdf_rp_e = eval_pdf(
            {**params, "type": jnp.full_like(t, BSDF_ROUGHPLASTIC)}, wi, wo_rp,
            types=(BSDF_ROUGHPLASTIC,),
        )
        w_rp = jnp.where(
            (pdf_rp_e > 0.0)[..., None],
            f_rp_e / jnp.maximum(pdf_rp_e, 1e-20)[..., None], 0.0,
        )
        wo_sel.append((BSDF_ROUGHPLASTIC, wo_rp))
        w_sel.append((BSDF_ROUGHPLASTIC, w_rp))
        pdf_sel.append((BSDF_ROUGHPLASTIC, pdf_rp_e))

    if has(BSDF_HK):
        # HK sampling (reference: hk.cpp sample:305-374): pick the delta
        # transmission with the average unscattered probability, otherwise
        # sample the HG phase lobe and weight by eval/pdf.
        from ..render.medium import hg_sample

        tau_d, _, aci_hk, p_spec = _hk_quantities(params, cos_i)
        pick_spec_hk = u1 < p_spec
        wo_spec_hk = -wi
        w_spec_hk = jnp.exp(-tau_d / aci_hk[..., None]) / jnp.maximum(
            p_spec, 1e-9
        )[..., None]
        wo_hg, _ = hg_sample(params["eta"], -wi, u2)
        f_hg, pdf_hg = eval_pdf(
            {**params, "type": jnp.full_like(t, BSDF_HK)}, wi, wo_hg,
            types=(BSDF_HK,),
        )
        w_hg = jnp.where(
            (pdf_hg > 0.0)[..., None],
            f_hg / jnp.maximum(pdf_hg, 1e-20)[..., None], 0.0,
        )
        wo_hk = jnp.where(pick_spec_hk[..., None], wo_spec_hk, wo_hg)
        w_hk = jnp.where(pick_spec_hk[..., None], w_spec_hk, w_hg)
        pdf_hk = jnp.where(pick_spec_hk, p_spec, pdf_hg)
        wo_sel.append((BSDF_HK, wo_hk))
        w_sel.append((BSDF_HK, w_hk))
        pdf_sel.append((BSDF_HK, pdf_hk))
        delta = delta | ((t == BSDF_HK) & pick_spec_hk)
        passthrough = passthrough | ((t == BSDF_HK) & pick_spec_hk)

    # --- combine by type mask ---
    wo = jnp.zeros_like(wi).at[..., 2].set(1.0)
    weight = jnp.zeros(wi.shape[:-1] + (3,))
    pdf = jnp.zeros(wi.shape[:-1])
    eta = jnp.ones(wi.shape[:-1])
    for code, v in wo_sel:
        wo = jnp.where((t == code)[..., None], v, wo)
    for code, v in w_sel:
        weight = jnp.where((t == code)[..., None], v, weight)
    for code, v in pdf_sel:
        pdf = jnp.where(t == code, v, pdf)
    for code, v in eta_sel:
        eta = jnp.where(t == code, v, eta)

    # Reflective models need wi on the front side.
    needs_front = (
        (t != BSDF_DIELECTRIC) & (t != BSDF_ROUGHDIELECTRIC) & (t != BSDF_NULL)
        & (t != BSDF_HK)
    )
    ok = jnp.where(needs_front, cos_i > 1e-6, True)
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    return {"wo": wo, "weight": weight, "pdf": pdf, "delta": delta, "eta": eta,
            "pass": passthrough}


def _strip_container(params: dict) -> dict:
    return {k: v for k, v in params.items()
            if k not in ("is_mask", "opacity", "is_blend", "blend_b",
                         "blend_w", "is_coat", "coat_eta", "coat_sa",
                         "coat_spec", "coat_alpha")}


def _refract_in(w, eta):
    """Refract into the layer preserving the z sign; returns (w', R).
    Reference: coating.cpp refractIn + libcore fresnelDielectricExt."""
    cos_i = jnp.abs(w[..., 2])
    inv_eta = 1.0 / eta
    cos_t_sqr = 1.0 - (1.0 - cos_i * cos_i) * (inv_eta * inv_eta)
    tir = cos_t_sqr <= 0.0
    cos_t = jnp.sqrt(jnp.maximum(cos_t_sqr, 0.0))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    w_out = jnp.stack([
        inv_eta * w[..., 0], inv_eta * w[..., 1],
        jnp.sign(w[..., 2]) * cos_t,
    ], axis=-1)
    return w_out, r


def _refract_out(w, eta):
    """Refract out of the layer (reference: coating.cpp refractOut)."""
    cos_i = jnp.abs(w[..., 2])
    cos_t_sqr = 1.0 - (1.0 - cos_i * cos_i) * (eta * eta)
    tir = cos_t_sqr <= 0.0
    cos_t = jnp.sqrt(jnp.maximum(cos_t_sqr, 0.0))
    inv_eta = 1.0 / eta
    rs = (cos_i - inv_eta * cos_t) / jnp.maximum(cos_i + inv_eta * cos_t, 1e-12)
    rp = (inv_eta * cos_i - cos_t) / jnp.maximum(inv_eta * cos_i + cos_t, 1e-12)
    r = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    w_out = jnp.stack([
        eta * w[..., 0], eta * w[..., 1],
        jnp.sign(w[..., 2]) * cos_t,
    ], axis=-1)
    return w_out, r


def _coat_spec_weight(params):
    """Specular sampling weight 1/(avgAbsorption+1)
    (reference: coating.cpp configure())."""
    avg_abs = jnp.mean(jnp.exp(-2.0 * params["coat_sa"]), axis=-1)
    return 1.0 / (avg_abs + 1.0)


def _coat_prob_specular(r12, w_spec):
    return (r12 * w_spec) / jnp.maximum(
        r12 * w_spec + (1.0 - r12) * (1.0 - w_spec), 1e-12
    )


def eval_pdf_full(params: dict, wi: jnp.ndarray, wo: jnp.ndarray,
                  types: tuple | None = None):
    """eval_pdf with container resolution (mask opacity, blend mixture).

    For blend rows ``params`` carries child0 (substituted by gather_params)
    and ``blend_b``/``blend_w``: f = (1-w)·f0 + w·f1 and the pdf is the
    matching mixture (reference: bsdfs/blendbsdf.cpp eval/pdf). For mask
    rows the smooth part is opacity-scaled and the pdf carries the child
    selection probability (reference: bsdfs/mask.cpp).
    """
    core = _strip_container(params)
    f, pdf = eval_pdf(core, wi, wo, types=types)
    if "coat_eta" in params:
        # Coated rows: evaluate the child with refracted directions,
        # Fresnel transmissions, absorption, and the solid-angle
        # compression factor (reference: coating.cpp eval/pdf).
        eta_c = params["coat_eta"]
        wi_p, r12 = _refract_in(wi, eta_c)
        wo_p, r21 = _refract_in(wo, eta_c)
        f_n, pdf_n = eval_pdf(core, wi_p, wo_p, types=types)
        absorb = jnp.exp(-params["coat_sa"] * (
            1.0 / jnp.maximum(jnp.abs(wi_p[..., 2]), 1e-6)
            + 1.0 / jnp.maximum(jnp.abs(wo_p[..., 2]), 1e-6)
        )[..., None])
        inv_eta2 = 1.0 / (eta_c * eta_c)
        jac = inv_eta2 * wo[..., 2] / jnp.maximum(wo_p[..., 2], 1e-6)
        f_c = f_n * ((1.0 - r12) * (1.0 - r21) * jac)[..., None] * absorb
        w_spec = _coat_spec_weight(params)
        prob_spec = _coat_prob_specular(r12, w_spec)
        pdf_c = pdf_n * jac * (1.0 - prob_spec)
        # Rough layer boundary (reference: roughcoating.cpp eval/pdf):
        # a GGX reflection lobe joins the solid-angle measure. The smooth
        # layer's delta lobe contributes nothing here. Transmission
        # scaling keeps the smooth-boundary Fresnel (the reference's
        # precomputed roughTransmittance table -> this as alpha -> 0).
        a_c = params.get("coat_alpha", jnp.zeros_like(params["coat_eta"]))
        rough_c = a_c > 1e-4
        cos_i_e = wi[..., 2]
        cos_o_e = wo[..., 2]
        refl_side = cos_i_e * cos_o_e > 0.0
        h_r = wi + wo
        h_r = h_r / jnp.maximum(
            jnp.linalg.norm(h_r, axis=-1, keepdims=True), 1e-12
        )
        h_r = h_r * jnp.sign(cos_o_e)[..., None]
        f_h, _, _, _ = fresnel_dielectric(
            jnp.abs(jnp.sum(wi * h_r, axis=-1)), params["coat_eta"]
        )
        d_h = mf.ggx_ndf(h_r, a_c)
        g_h = mf.smith_g1(wi, h_r, a_c) * mf.smith_g1(wo, h_r, a_c)
        spec_val = f_h * d_h * g_h / jnp.maximum(
            4.0 * jnp.abs(cos_i_e), 1e-12
        )
        pdf_spec = mf.vndf_pdf(wi, h_r, a_c) / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo * h_r, axis=-1)), 1e-12
        )
        add = rough_c & refl_side
        no_tir = (r12 < 1.0) & (r21 < 1.0)
        is_c = params["is_coat"]
        # spec_val = F D G / (4 |cos_i|) already carries the folded
        # |cos_o| (the reference's eval convention, roughconductor.cpp).
        f_c = f_c + jnp.where(
            add[..., None], params["coat_spec"] * spec_val[..., None], 0.0,
        )
        pdf_c = pdf_c + jnp.where(add, prob_spec * pdf_spec, 0.0)
        f = jnp.where((is_c & no_tir)[..., None], f_c,
                      jnp.where(is_c[..., None], 0.0, f))
        pdf = jnp.where(is_c & no_tir, pdf_c, jnp.where(is_c, 0.0, pdf))
    if "blend_b" in params:
        f1, p1 = eval_pdf(params["blend_b"], wi, wo, types=types)
        w = params["blend_w"]
        is_b = params["is_blend"]
        f = jnp.where(is_b[..., None], (1.0 - w)[..., None] * f + w[..., None] * f1, f)
        pdf = jnp.where(is_b, (1.0 - w) * pdf + w * p1, pdf)
    if "opacity" in params:
        op = params["opacity"]
        p_op = jnp.clip(luminance(op), 1e-3, 1.0)
        is_m = params["is_mask"]
        f = jnp.where(is_m[..., None], op * f, f)
        pdf = jnp.where(is_m, p_op * pdf, pdf)
    return f, pdf


def sample_full(params: dict, wi: jnp.ndarray, u0: jnp.ndarray,
                u1: jnp.ndarray, u2: jnp.ndarray,
                types: tuple | None = None):
    """sample with container resolution.

    ``u0`` selects the container branch: blend child (prob = blend factor)
    or mask pass-through (prob = 1 - mean opacity). Smooth blend samples are
    re-weighted by the full mixture (one-sample MIS over children, as the
    reference's blendbsdf.cpp sample); delta child samples keep the child
    weight with the selection pmf folded into the pdf.
    """
    core = _strip_container(params)
    has_blend = "blend_b" in params
    has_mask = "opacity" in params
    has_coat = "coat_eta" in params
    if not has_blend and not has_mask and not has_coat:
        return sample(core, wi, u1, u2, types=types)
    if has_coat:
        # Coating rows build a complete sample record; other rows fall
        # through to the remaining containers (reference: coating.cpp
        # sample()).
        eta_c = params["coat_eta"]
        wi_p, r12 = _refract_in(wi, eta_c)
        w_spec = _coat_spec_weight(params)
        prob_spec = _coat_prob_specular(r12, w_spec)
        pick_spec = u0 < prob_spec
        bs_n = sample(core, wi_p, u1, u2, types=types)
        wo_out, r21 = _refract_out(bs_n["wo"], eta_c)
        absorb = jnp.exp(-params["coat_sa"] * (
            1.0 / jnp.maximum(jnp.abs(wi_p[..., 2]), 1e-6)
            + 1.0 / jnp.maximum(jnp.abs(bs_n["wo"][..., 2]), 1e-6)
        )[..., None])
        w_nested = (bs_n["weight"] * absorb
                    * ((1.0 - r12) * (1.0 - r21)
                       / jnp.maximum(1.0 - prob_spec, 1e-6))[..., None])
        no_tir = (r12 < 1.0) & (r21 < 1.0)
        w_nested = jnp.where(no_tir[..., None], w_nested, 0.0)
        inv_eta2 = 1.0 / (eta_c * eta_c)
        jac = inv_eta2 * wo_out[..., 2] / jnp.maximum(bs_n["wo"][..., 2], 1e-6)
        pdf_nested = bs_n["pdf"] * jnp.abs(jac) * (1.0 - prob_spec)
        # Specular lobe: delta reflection for smooth layers; GGX VNDF
        # reflection for rough boundaries (reference: roughcoating.cpp
        # sample). VNDF identity: f cos / pdf_vndf = F G1(wo).
        a_c = params.get("coat_alpha", jnp.zeros_like(params["coat_eta"]))
        rough_c = a_c > 1e-4
        m_c = mf.sample_vndf(wi, jnp.maximum(a_c, 1e-4), u2)
        wo_rough = 2.0 * jnp.sum(wi * m_c, axis=-1, keepdims=True) * m_c - wi
        f_m, _, _, _ = fresnel_dielectric(
            jnp.abs(jnp.sum(wi * m_c, axis=-1)), eta_c
        )
        g1o = mf.smith_g1(wo_rough, m_c, a_c)
        ok_rough = wo_rough[..., 2] * wi[..., 2] > 1e-7
        w_rough = params["coat_spec"] * jnp.where(
            ok_rough, f_m * g1o / jnp.maximum(prob_spec, 1e-6), 0.0
        )[..., None]
        pdf_rough = prob_spec * mf.vndf_pdf(wi, m_c, a_c) / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo_rough * m_c, axis=-1)), 1e-12
        )
        wo_spec = jnp.where(rough_c[..., None], wo_rough, reflect(wi))
        w_sp = jnp.where(
            rough_c[..., None], w_rough,
            params["coat_spec"] * (r12 / jnp.maximum(prob_spec, 1e-6))[..., None],
        )
        pdf_sp = jnp.where(rough_c, pdf_rough, prob_spec)
        is_c = params["is_coat"]
        coat = {
            "wo": jnp.where(pick_spec[..., None], wo_spec, wo_out),
            "weight": jnp.where(pick_spec[..., None], w_sp, w_nested),
            "pdf": jnp.where(pick_spec, pdf_sp, pdf_nested),
            "delta": (pick_spec & ~rough_c) | (~pick_spec & bs_n["delta"]),
            "eta": jnp.ones_like(r12),
            "pass": jnp.zeros_like(pick_spec),
        }
        rest = sample_full(
            {k: v for k, v in params.items()
             if k not in ("is_coat", "coat_eta", "coat_sa", "coat_spec")},
            wi, u0, u1, u2, types=types,
        )
        return {
            k: jnp.where(
                is_c[..., None] if rest[k].ndim > is_c.ndim else is_c,
                coat[k], rest[k],
            )
            for k in rest
        }

    if has_blend:
        w = params["blend_w"]
        is_b = params["is_blend"]
        pick1 = is_b & (u0 < w)
        core_sel = _where_params(pick1, params["blend_b"], core)
    else:
        core_sel = core
        is_b = jnp.zeros(u1.shape, dtype=bool)
        pick1 = is_b
        w = jnp.zeros(u1.shape)

    bs = sample(core_sel, wi, u1, u2, types=types)

    if has_blend:
        # Smooth samples: re-evaluate against the full mixture.
        f_mix, pdf_mix = eval_pdf_full(params, wi, bs["wo"], types=types)
        smooth_b = is_b & ~bs["delta"]
        new_w = jnp.where(
            (pdf_mix > 0.0)[..., None],
            f_mix / jnp.maximum(pdf_mix, 1e-20)[..., None], 0.0,
        )
        bs["weight"] = jnp.where(smooth_b[..., None], new_w, bs["weight"])
        bs["pdf"] = jnp.where(smooth_b, pdf_mix, bs["pdf"])
        # Delta child: selection pmf folds into the pdf; weight already
        # cancels (selection prob == blend factor).
        sel_p = jnp.where(pick1, w, 1.0 - w)
        bs["pdf"] = jnp.where(is_b & bs["delta"], sel_p * bs["pdf"], bs["pdf"])

    if has_mask:
        op = params["opacity"]
        p_op = jnp.clip(luminance(op), 1e-3, 1.0)
        is_m = params["is_mask"]
        pass_thru = is_m & (u0 >= p_op)
        # Child branch: weight × op/p_op, pdf × p_op.
        bs["weight"] = jnp.where(
            (is_m & ~pass_thru)[..., None],
            bs["weight"] * (op / p_op[..., None]), bs["weight"],
        )
        bs["pdf"] = jnp.where(is_m & ~pass_thru, p_op * bs["pdf"], bs["pdf"])
        # Pass-through: continue straight through the surface.
        wo_pass = -wi
        bs["wo"] = jnp.where(pass_thru[..., None], wo_pass, bs["wo"])
        bs["weight"] = jnp.where(
            pass_thru[..., None],
            (1.0 - op) / jnp.maximum(1.0 - p_op, 1e-3)[..., None],
            bs["weight"],
        )
        bs["pdf"] = jnp.where(pass_thru, 1.0 - p_op, bs["pdf"])
        bs["delta"] = bs["delta"] | pass_thru
        bs["pass"] = bs["pass"] | pass_thru
        bs["eta"] = jnp.where(pass_thru, 1.0, bs["eta"])
    return bs
