"""Irawan & Marschner woven-cloth BRDF.

Reference: mitsuba/src/bsdfs/irawan.{h,cpp} — a spatially-varying cloth
model driven by an explicit weave pattern: the hit's UV selects a yarn
segment from the pattern tile, and the specular term integrates the
fiber highlight over the yarn's curved spine (filament yarns reflect
along a cylinder; staple yarns along twisted fibers), with a von Mises
phase function and Seeliger attenuation. Sampling is cosine-weighted
(as in the reference, which lacks a specialized sampler).

TPU re-design: per-yarn lookups are table gathers over [Y]-row arrays,
every reference early-return becomes a mask, and all four
radius-of-curvature conic branches evaluate guarded and mask-select.
The reference's correlated-noise umax perturbation and TEA-hash
intensity variation (period/fineness) are omitted (their default-off
path); the specular normalization is the same cosine-MC estimate the
reference computes in configure().

Weave patterns load from the reference's weave-DSL text format
(irawan.h WeavePatternGrammar) with $parameter substitution, or from the
built-in plain-weave below (the reference ships its patterns as example
-scene data files, absent here).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

PI = np.pi
INV_PI = 1.0 / np.pi

# Yarn row layout in the [Y, 10] table.
_Y_TYPE = 0  # 0 = warp, 1 = weft
_Y_PSI = 1
_Y_UMAX = 2
_Y_KAPPA = 3
_Y_WIDTH = 4
_Y_LENGTH = 5
_Y_CU = 6
_Y_CV = 7

# Consts row layout ([12]).
_C_ALPHA = 0
_C_BETA = 1
_C_SS = 2
_C_HWIDTH = 3
_C_WARPAREA = 4
_C_WEFTAREA = 5
_C_REPEATU = 6
_C_REPEATV = 7
_C_NORM = 8


@dataclass
class WeavePattern:
    """Host-side weave description (reference: irawan.h WeavePattern)."""

    name: str = ""
    alpha: float = 0.0
    beta: float = 0.0
    ss: float = 0.0
    h_width: float = 0.0
    warp_area: float = 0.0
    weft_area: float = 0.0
    tile_width: int = 1
    tile_height: int = 1
    pattern: np.ndarray = field(default_factory=lambda: np.ones((1, 1), np.int32))
    yarns: list = field(default_factory=list)  # dicts
    repeat_u: float = 1.0
    repeat_v: float = 1.0

    def tables(self):
        """Pack into (pattern [th, tw] i32 0-based, yarns [Y, 10] f32,
        kd [Y,3], ks [Y,3], consts [12] f32). Normalization filled later."""
        y = np.zeros((max(len(self.yarns), 1), 10), np.float32)
        kd = np.zeros((max(len(self.yarns), 1), 3), np.float32)
        ks = np.zeros((max(len(self.yarns), 1), 3), np.float32)
        for i, yarn in enumerate(self.yarns):
            y[i, _Y_TYPE] = 0.0 if yarn["type"] == "warp" else 1.0
            y[i, _Y_PSI] = yarn.get("psi", 0.0)
            y[i, _Y_UMAX] = yarn.get("umax", 0.5)
            y[i, _Y_KAPPA] = yarn.get("kappa", 0.0)
            y[i, _Y_WIDTH] = yarn.get("width", 1.0)
            y[i, _Y_LENGTH] = yarn.get("length", 1.0)
            y[i, _Y_CU] = yarn.get("centerU", 0.5)
            y[i, _Y_CV] = yarn.get("centerV", 0.5)
            kd[i] = np.asarray(yarn.get("kd", [0.5, 0.5, 0.5]))
            ks[i] = np.asarray(yarn.get("ks", [0.5, 0.5, 0.5]))
        consts = np.zeros(12, np.float32)
        consts[_C_ALPHA] = self.alpha
        consts[_C_BETA] = self.beta
        consts[_C_SS] = self.ss
        consts[_C_HWIDTH] = self.h_width
        consts[_C_WARPAREA] = self.warp_area
        consts[_C_WEFTAREA] = self.weft_area
        consts[_C_REPEATU] = self.repeat_u
        consts[_C_REPEATV] = self.repeat_v
        consts[_C_NORM] = 1.0
        return {
            "pattern": np.asarray(self.pattern, np.int32) - 1,  # 0-based
            "yarns": y, "kd": kd, "ks": ks, "consts": consts,
        }


# Built-in plain weave: alternating warp/weft in a 2x2 tile, staple
# cotton-like yarns. Representative parameters in the thesis's ranges —
# the reference's exact pattern tables ship as example-scene data files.
PLAIN_WEAVE = """
weave {
    name = "Built-in plain weave",
    alpha = 0.3, beta = 4.0, ss = 0.0, hWidth = 0.6,
    warpArea = 0.5, weftArea = 0.5,
    tileWidth = 2, tileHeight = 2,
    pattern { 1, 2, 3, 4 },
    yarn { type = warp, psi = 30, umax = 40, kappa = -0.5,
           width = 1, length = 1, centerU = 0.25, centerV = 0.25,
           kd = {0.45, 0.4, 0.35}, ks = {0.4, 0.4, 0.4} },
    yarn { type = weft, psi = 30, umax = 40, kappa = -0.5,
           width = 1, length = 1, centerU = 0.75, centerV = 0.25,
           kd = {0.45, 0.4, 0.35}, ks = {0.4, 0.4, 0.4} },
    yarn { type = weft, psi = 30, umax = 40, kappa = -0.5,
           width = 1, length = 1, centerU = 0.25, centerV = 0.75,
           kd = {0.45, 0.4, 0.35}, ks = {0.4, 0.4, 0.4} },
    yarn { type = warp, psi = 30, umax = 40, kappa = -0.5,
           width = 1, length = 1, centerU = 0.75, centerV = 0.75,
           kd = {0.45, 0.4, 0.35}, ks = {0.4, 0.4, 0.4} }
}
"""


def parse_weave(text: str, params: dict | None = None) -> WeavePattern:
    """Parse the reference's weave-DSL (irawan.h WeavePatternGrammar):
    ``weave { key = value, ..., pattern { ints }, yarn { ... }, ... }``.
    ``$name`` tokens resolve from ``params``; angles are degrees."""
    import re

    params = params or {}

    def subst(tok: str):
        if tok.startswith("$"):
            return params[tok[1:]]
        return tok

    # Strip comments.
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    body = text[text.index("weave") + 5:]
    body = body[body.index("{") + 1:body.rindex("}")]

    wp = WeavePattern()
    angle_keys = {"psi", "umax"}

    # Extract pattern block.
    m = re.search(r"pattern\s*\{([^}]*)\}", body)
    ints = [int(subst(t.strip())) for t in m.group(1).split(",") if t.strip()]
    # Extract yarn blocks.
    yarn_texts = re.findall(r"yarn\s*\{((?:[^{}]|\{[^}]*\})*)\}", body)
    rest = re.sub(r"pattern\s*\{[^}]*\}", "", body)
    rest = re.sub(r"yarn\s*\{(?:[^{}]|\{[^}]*\})*\}", "", rest)

    def parse_kv(block: str) -> dict:
        out = {}
        for m2 in re.finditer(
            r"(\w+)\s*=\s*(\{[^}]*\}|\"[^\"]*\"|[^,\s][^,]*)", block
        ):
            k, v = m2.group(1), m2.group(2).strip()
            if v.startswith("{"):
                out[k] = [float(subst(x.strip()))
                          for x in v[1:-1].split(",") if x.strip()]
            elif v.startswith('"'):
                out[k] = v[1:-1]
            else:
                v = subst(v)
                try:
                    out[k] = float(v)
                except (TypeError, ValueError):
                    out[k] = v
        return out

    kv = parse_kv(rest)
    wp.name = str(kv.get("name", ""))
    wp.alpha = float(kv.get("alpha", 0.0))
    wp.beta = float(kv.get("beta", 0.0))
    wp.ss = float(kv.get("ss", 0.0))
    wp.h_width = float(kv.get("hWidth", 0.0))
    wp.warp_area = float(kv.get("warpArea", 1.0))
    wp.weft_area = float(kv.get("weftArea", 1.0))
    wp.tile_width = int(kv.get("tileWidth", 1))
    wp.tile_height = int(kv.get("tileHeight", 1))
    wp.pattern = np.asarray(ints, np.int32).reshape(
        wp.tile_height, wp.tile_width
    )
    for yt in yarn_texts:
        yv = parse_kv(yt)
        yarn = {
            "type": str(yv.get("type", "warp")).strip(),
            "width": float(yv.get("width", 1.0)),
            "length": float(yv.get("length", 1.0)),
            "centerU": float(yv.get("centerU", 0.5)),
            "centerV": float(yv.get("centerV", 0.5)),
            "kappa": float(yv.get("kappa", 0.0)),
            "kd": yv.get("kd", [0.5, 0.5, 0.5]),
            "ks": yv.get("ks", [0.5, 0.5, 0.5]),
        }
        for k in ("psi", "umax"):
            if k in yv:
                yarn[k] = float(yv[k]) * PI / 180.0
        wp.yarns.append(yarn)
    return wp


def _von_mises(cos_x, b):
    """exp(b cos x) / (2 pi I0(b)) — Abramowitz & Stegun I0 polynomials
    (reference: irawan.cpp vonMises)."""
    ab = jnp.abs(b)
    t_small = (ab / 3.75) ** 2
    i0_small = 1.0 + t_small * (3.5156229 + t_small * (3.0899424 + t_small * (
        1.2067492 + t_small * (0.2659732 + t_small * (0.0360768
                                                      + t_small * 0.0045813)))))
    t_big = 3.75 / jnp.maximum(ab, 1e-6)
    i0_big = jnp.exp(ab) / jnp.sqrt(jnp.maximum(ab, 1e-6)) * (
        0.39894228 + t_big * (0.01328592 + t_big * (0.00225319 + t_big * (
            -0.00157565 + t_big * (0.00916281 + t_big * (-0.02057706 + t_big * (
                0.02635537 + t_big * (-0.01647633 + t_big * 0.00392377)))))))
    )
    i0 = jnp.where(ab <= 3.75, i0_small, i0_big)
    return jnp.exp(b * cos_x) / (2.0 * PI * i0)


def _seeliger(c1, c2):
    c1 = jnp.maximum(c1, 0.0)
    c2 = jnp.maximum(c2, 0.0)
    ok = (c1 > 0.0) & (c2 > 0.0)
    return jnp.where(ok, c1 * c2 / jnp.maximum(4.0 * PI * (c1 + c2), 1e-12),
                     0.0)


def _radius_of_curvature(u, umax, kappa, w, l):
    """Conic spine radius (reference: irawan.cpp radiusOfCurvature;
    all four branches evaluated guarded, mask-selected)."""
    rhat = 1.0 + kappa * (1.0 + 1.0 / jnp.tan(umax))
    a = 0.5 * w
    sin_umax = jnp.sin(umax)

    r_circle = (0.5 * l - a * sin_umax) / jnp.maximum(sin_umax, 1e-6)

    rhat_e = jnp.where(jnp.abs(rhat) > 1e-6, rhat, 1.0)
    tmax_e = jnp.arctan(rhat_e * jnp.tan(umax))
    bhat_e = (0.5 * l - a * sin_umax) / jnp.maximum(
        jnp.abs(jnp.sin(tmax_e)), 1e-6) * jnp.sign(jnp.sin(tmax_e))
    ahat_e = bhat_e / rhat_e
    t_e = jnp.arctan(rhat_e * jnp.tan(u))
    r_ellipse = jnp.power(
        jnp.maximum(bhat_e**2 * jnp.cos(t_e)**2 + ahat_e**2 * jnp.sin(t_e)**2,
                    0.0), 1.5
    ) / jnp.maximum(jnp.abs(ahat_e * bhat_e), 1e-12) * jnp.sign(ahat_e * bhat_e)

    arg_h = jnp.clip(rhat_e * jnp.tan(umax), -0.999999, 0.999999)
    tmax_h = -jnp.arctanh(arg_h)
    sinh_t = jnp.sinh(tmax_h)
    bhat_h = (0.5 * l - a * sin_umax) / jnp.where(
        jnp.abs(sinh_t) > 1e-6, sinh_t, 1e-6)
    ahat_h = bhat_h / rhat_e
    t_h = -jnp.arctanh(jnp.clip(rhat_e * jnp.tan(u), -0.999999, 0.999999))
    r_hyper = -jnp.power(
        jnp.maximum(bhat_h**2 * jnp.cosh(t_h)**2 + ahat_h**2 * jnp.sinh(t_h)**2,
                    0.0), 1.5
    ) / jnp.where(jnp.abs(ahat_h * bhat_h) > 1e-12, ahat_h * bhat_h, 1e-12)

    tmax_p = jnp.tan(umax)
    ahat_p = (0.5 * l - a * sin_umax) / jnp.maximum(2.0 * tmax_p, 1e-6)
    t_p = jnp.tan(u)
    r_par = 2.0 * ahat_p * jnp.power(1.0 + t_p * t_p, 1.5)

    r = jnp.where(jnp.abs(rhat - 1.0) < 1e-6, r_circle,
                  jnp.where(rhat > 1e-6, r_ellipse,
                            jnp.where(rhat < -1e-6, r_hyper, r_par)))
    return r


def _filament_integrand(u, v, wi, wo, alpha, beta, ss, umax, kappa, w, l,
                        h_width):
    """reference: irawan.cpp evalFilamentIntegrand."""
    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    u_of_v = jnp.arctan(h[..., 1] / jnp.maximum(jnp.abs(h[..., 2]), 1e-9)
                        * jnp.sign(h[..., 2]))
    in_range = jnp.abs(u_of_v) < umax

    nx = jnp.sin(v)
    ny = jnp.sin(u_of_v) * jnp.cos(v)
    nz = jnp.cos(u_of_v) * jnp.cos(v)
    ty = jnp.cos(u_of_v)
    tz = -jnp.sin(u_of_v)

    r_c = _radius_of_curvature(
        jnp.minimum(jnp.abs(u_of_v), (1.0 - ss) * umax),
        (1.0 - ss) * umax, kappa, w, l,
    )
    a = 0.5 * w
    sum_len = jnp.linalg.norm(wi + wo, axis=-1)
    # t x h with t = (0, ty, tz): x component = ty*hz - tz*hy.
    t_cross_h_x = ty * h[..., 2] - tz * h[..., 1]
    gu = a * (r_c + a * jnp.cos(v)) / jnp.maximum(
        sum_len * jnp.abs(t_cross_h_x), 1e-9
    )
    fc = alpha + _von_mises(-jnp.sum(wi * wo, axis=-1), beta)
    att = _seeliger(
        nx * wi[..., 0] + ny * wi[..., 1] + nz * wi[..., 2],
        nx * wo[..., 0] + ny * wo[..., 1] + nz * wo[..., 2],
    )
    smooth_arg = (jnp.abs(u_of_v) - (1.0 - ss) * umax) / jnp.maximum(
        ss * umax, 1e-9)
    sm = jnp.clip(smooth_arg, 0.0, 1.0)
    smoothstep = sm * sm * (3.0 - 2.0 * sm)
    att = jnp.where(ss > 0.0, att * (1.0 - smoothstep), att)

    fs = gu * fc * att * PI * l
    delta_y = l * h_width
    y_of_v = jnp.clip(u_of_v * 0.5 * l / umax,
                      0.5 * (delta_y - l), 0.5 * (l - delta_y))
    hit_band = jnp.abs(y_of_v - u * 0.5 * l / umax) < 0.5 * delta_y
    valid = in_range & hit_band & (w * jnp.sin(umax) < l) & (kappa >= -1.0) \
        & (ss >= 0.0) & (ss < 1.0)
    return jnp.where(valid, fs / jnp.maximum(delta_y, 1e-9), 0.0)


def _staple_integrand(u, v, wi, wo, alpha, beta, psi, umax, kappa, w, l,
                      h_width):
    """reference: irawan.cpp evalStapleIntegrand."""
    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    denom = jnp.sqrt(jnp.maximum(
        hx * hx + (hy * jnp.sin(u) + hz * jnp.cos(u)) ** 2, 1e-12
    )) * jnp.tan(psi)
    d = (hy * jnp.cos(u) - hz * jnp.sin(u)) / jnp.maximum(
        jnp.abs(denom), 1e-9) * jnp.sign(denom)
    v_of_u = jnp.arctan2(-hy * jnp.sin(u) - hz * jnp.cos(u), hx) + jnp.arccos(
        jnp.clip(d, -1.0, 1.0)
    )
    in_range = (jnp.abs(d) < 1.0) & (jnp.abs(v_of_u) < PI / 2.0)

    nx = jnp.sin(v_of_u)
    ny = jnp.sin(u) * jnp.cos(v_of_u)
    nz = jnp.cos(u) * jnp.cos(v_of_u)
    r_c = _radius_of_curvature(jnp.abs(u), umax, kappa, w, l)
    a = 0.5 * w
    sum_len = jnp.linalg.norm(wi + wo, axis=-1)
    ndoth = nx * hx + ny * hy + nz * hz
    gv = a * (r_c + a * jnp.cos(v_of_u)) / jnp.maximum(
        sum_len * jnp.abs(ndoth) * jnp.abs(jnp.sin(psi)), 1e-9
    )
    fc = alpha + _von_mises(-jnp.sum(wi * wo, axis=-1), beta)
    att = _seeliger(
        nx * wi[..., 0] + ny * wi[..., 1] + nz * wi[..., 2],
        nx * wo[..., 0] + ny * wo[..., 1] + nz * wo[..., 2],
    )
    fs = gv * fc * att * 2.0 * w * umax
    delta_x = w * h_width
    x_of_u = jnp.clip(v_of_u * w / PI,
                      0.5 * (delta_x - w), 0.5 * (w - delta_x))
    hit_band = jnp.abs(x_of_u - v * w / PI) < 0.5 * delta_x
    valid = in_range & hit_band & (w * jnp.sin(umax) < l) & (kappa >= -1.0)
    return jnp.where(valid, fs / jnp.maximum(delta_x, 1e-9), 0.0)


def eval_irawan(tables: dict, uv: jnp.ndarray, wi: jnp.ndarray,
                wo: jnp.ndarray, include_diffuse: bool = True):
    """f(wi, wo) * cos(theta_o) at uv for front-side pairs [N].

    ``tables``: pattern [th, tw] i32 (0-based), yarns [Y,10], kd/ks [Y,3],
    consts [12]. Mirrors irawan.cpp eval (solid-angle measure).
    """
    c = tables["consts"]
    tw = tables["pattern"].shape[1]
    th = tables["pattern"].shape[0]
    u_t = uv[..., 0] * c[_C_REPEATU]
    v_t = (1.0 - uv[..., 1]) * c[_C_REPEATV]
    x = u_t * tw
    y = v_t * th
    lx = jnp.mod(jnp.floor(x).astype(jnp.int32), tw)
    ly = jnp.mod(jnp.floor(y).astype(jnp.int32), th)
    yid = tables["pattern"][ly, lx]

    yr = tables["yarns"][yid]
    is_weft = yr[..., _Y_TYPE] > 0.5
    w = yr[..., _Y_WIDTH]
    l = yr[..., _Y_LENGTH]
    psi = yr[..., _Y_PSI]
    umax = yr[..., _Y_UMAX]
    kappa = yr[..., _Y_KAPPA]

    cx = jnp.floor(x / tw) * tw + yr[..., _Y_CU] * tw
    cy = jnp.floor(y / th) * th + (1.0 - yr[..., _Y_CV]) * th
    xx = x - cx
    yy = -(y - cy)

    # Weft yarns: rotate xy and directions by pi/2 about z.
    rx = jnp.where(is_weft, -yy, xx)
    ry = jnp.where(is_weft, xx, yy)
    wi_r = jnp.stack([
        jnp.where(is_weft, -wi[..., 1], wi[..., 0]),
        jnp.where(is_weft, wi[..., 0], wi[..., 1]),
        wi[..., 2],
    ], axis=-1)
    wo_r = jnp.stack([
        jnp.where(is_weft, -wo[..., 1], wo[..., 0]),
        jnp.where(is_weft, wo[..., 0], wo[..., 1]),
        wo[..., 2],
    ], axis=-1)

    u_c = ry / (l / 2.0) * umax
    v_c = rx * PI / jnp.maximum(w, 1e-9)

    int_staple = _staple_integrand(
        u_c, v_c, wi_r, wo_r, c[_C_ALPHA], c[_C_BETA], psi, umax, kappa,
        w, l, c[_C_HWIDTH],
    )
    int_fil = _filament_integrand(
        u_c, v_c, wi_r, wo_r, c[_C_ALPHA], c[_C_BETA], c[_C_SS], umax,
        kappa, w, l, c[_C_HWIDTH],
    )
    integrand = jnp.where(psi != 0.0, int_staple, int_fil)

    area = c[_C_WARPAREA] + c[_C_WEFTAREA]
    area_scale = jnp.where(
        is_weft, area / jnp.maximum(c[_C_WEFTAREA], 1e-9),
        area / jnp.maximum(c[_C_WARPAREA], 1e-9),
    )
    spec = (integrand * c[_C_NORM] * area_scale)[..., None] * tables["ks"][yid]
    f = spec
    if include_diffuse:
        f = f + tables["kd"][yid] * INV_PI
    cos_o = jnp.maximum(wo[..., 2], 0.0)
    front = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(front[..., None], f * cos_o[..., None], 0.0)


def specular_normalization(tables: dict, n_samples: int = 10_000,
                           seed: int = 0) -> float:
    """MC estimate matching irawan.cpp configure(): cosine-sampled wi/wo,
    uniform uv; norm = N / (max_channel(sum of raw integrands) * pi)."""
    from ..core import warp

    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    wi = warp.square_to_cosine_hemisphere(jax.random.uniform(k1, (n_samples, 2)))
    wo = warp.square_to_cosine_hemisphere(jax.random.uniform(k2, (n_samples, 2)))
    uv = jax.random.uniform(k3, (n_samples, 2))
    t = dict(tables)
    t["consts"] = jnp.asarray(t["consts"]).at[_C_NORM].set(1.0)
    ks_one = jnp.ones_like(jnp.asarray(t["ks"]))
    t["ks"] = ks_one
    t["kd"] = jnp.zeros_like(ks_one)
    f = eval_irawan(t, uv, jnp.asarray(wi), jnp.asarray(wo),
                    include_diffuse=False)
    # eval returns f*cos_o; the reference accumulates eval/cos_o.
    cos_o = jnp.maximum(wo[..., 2], 1e-6)
    total = jnp.sum(f[..., 0] / cos_o)
    total = float(total)
    if total <= 0.0:
        return 0.0
    return n_samples / (total * PI)


def build_tables(pattern: WeavePattern) -> dict:
    """Host-side tables with the normalization baked into consts."""
    t = pattern.tables()
    t = {k: jnp.asarray(v) for k, v in t.items()}
    norm = specular_normalization(t)
    t["consts"] = t["consts"].at[_C_NORM].set(norm)
    return t
