"""Adjoint particle tracer and instant-radiosity VPL integrator.

TPU-native re-design of the reference's ``ptracer`` (light paths splatted
onto the film through camera connections; reference:
mitsuba/src/integrators/ptracer/{ptracer,capture}.cpp) and ``vpl``
(virtual point lights; reference: mitsuba/src/integrators/vpl/vpl.cpp,
mitsuba/src/librender/vpl.cpp). The per-particle recursion becomes a
``lax.scan`` over a wave of light paths; film splatting is a scatter-add
keyed by projected pixel — the wavefront dual of the camera-ray tracer.

Shading-normal asymmetry (the adjoint BSDF correction) is not applied;
scenes with strongly bent shading normals will differ slightly from the
camera-ray estimators.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..core import warp
from ..core.frame import coordinate_system, normalize, to_local, to_world
from . import intersect as isect
from .volpath import RAY_EPS, shading_frame


def sample_emission(scene, key, n: int):
    """Sample emission positions+directions with path weights.

    Area emitters: uniform-area triangle position (pdf em_tri_pdf/area),
    cosine-weighted direction → beta = Le·π/pdf_A. Point lights: uniform
    sphere (beta = 4π·I/pmf); spots: uniform cone over the cutoff with the
    reference's linear falloff; directional: disk over the scene bounding
    sphere. Returns dict(p, n, d, beta, from_area, Le).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n, 2))
    u3 = jax.random.uniform(k3, (n, 2))

    m = scene.em_tri_idx.shape[0]
    n_pt = scene.pt_pos.shape[0]
    pt_prob = scene.pt_select_prob if n_pt else jnp.float32(0.0)
    pick_pt = (u1 < pt_prob) if n_pt else jnp.zeros(n, bool)

    out = {
        "p": jnp.zeros((n, 3)), "n": jnp.zeros((n, 3)), "d": jnp.zeros((n, 3)),
        "beta": jnp.zeros((n, 3)), "Le": jnp.zeros((n, 3)),
        "from_area": jnp.zeros(n, bool), "valid": jnp.zeros(n, bool),
        "beta_A": jnp.zeros((n, 3)),
    }

    if m:
        sel = jnp.clip(jnp.searchsorted(scene.em_tri_cdf, u1), 0, m - 1)
        tri = scene.em_tri_idx[sel]
        b = warp.square_to_uniform_triangle(u2)
        p = (scene.tri_v0[tri] + b[..., 0:1] * scene.tri_e1[tri]
             + b[..., 1:2] * scene.tri_e2[tri])
        nrm = scene.tri_ng[tri]
        pdf_a = (scene.em_tri_pdf[sel] / jnp.maximum(scene.em_tri_area[sel], 1e-20)
                 ) * jnp.maximum(1.0 - pt_prob, 1e-9)
        le = scene.emitter_radiance[scene.tri_emitter[tri]]
        d_local = warp.square_to_cosine_hemisphere(u3)
        s_ax, t_ax = coordinate_system(nrm)
        d = to_world(s_ax, t_ax, nrm, d_local)
        # beta = Le·cosθ / (pdf_A · cosθ/π) = Le·π/pdf_A
        beta_area = le * (jnp.pi / jnp.maximum(pdf_a, 1e-20))[:, None]
        beta_a_only = 1.0 / jnp.maximum(pdf_a, 1e-20)
        area_rec = dict(
            p=p, n=nrm, d=d, beta=beta_area, Le=le,
            from_area=jnp.ones(n, bool), valid=jnp.ones(n, bool),
            beta_A=jnp.broadcast_to(beta_a_only[:, None], (n, 3)),
        )
        for k in out:
            out[k] = area_rec[k]

    if n_pt:
        sel_pt = jnp.clip(jnp.searchsorted(scene.pt_cdf, u2[..., 0]), 0, n_pt - 1)
        pmf = scene.pt_cdf[sel_pt] - jnp.where(
            sel_pt > 0, scene.pt_cdf[jnp.maximum(sel_pt - 1, 0)], 0.0
        )
        pmf = pmf * jnp.maximum(pt_prob, 1e-9)
        kind = scene.pt_kind[sel_pt]
        inten = scene.pt_intensity[sel_pt]
        # point (kind 0): uniform sphere
        d_sph = warp.square_to_uniform_sphere(u3)
        beta_pt = inten * (4.0 * jnp.pi / jnp.maximum(pmf, 1e-9))[:, None]
        # spot (kind 1): uniform cone about pt_dir, linear falloff
        co = scene.pt_cutoff_cos[sel_pt]
        cb = scene.pt_beam_cos[sel_pt]
        cos_c = 1.0 - u3[..., 0] * (1.0 - co)
        sin_c = jnp.sqrt(jnp.maximum(1.0 - cos_c * cos_c, 0.0))
        phi = 2.0 * jnp.pi * u3[..., 1]
        ax = scene.pt_dir[sel_pt]
        s_ax, t_ax = coordinate_system(ax)
        d_cone = (s_ax * (sin_c * jnp.cos(phi))[:, None]
                  + t_ax * (sin_c * jnp.sin(phi))[:, None] + ax * cos_c[:, None])
        pdf_cone = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - co), 1e-9)
        fall = jnp.clip((cos_c - co) / jnp.maximum(cb - co, 1e-6), 0.0, 1.0)
        beta_spot = inten * (fall / (pdf_cone * jnp.maximum(pmf, 1e-9)))[:, None]
        # directional (kind 2): pt_pos holds the direction TOWARD the light;
        # emit from a bounding-sphere disk along -pt_pos.
        center = 0.5 * (scene.aabb_lo + scene.aabb_hi)
        radius = 0.5 * jnp.linalg.norm(scene.aabb_hi - scene.aabb_lo) + 1e-3
        d_dir = -normalize(scene.pt_pos[sel_pt])
        s_d, t_d = coordinate_system(d_dir)
        disk = warp.square_to_uniform_disk_concentric(u3) * radius
        p_dir = (center[None] - d_dir * radius
                 + s_d * disk[..., 0:1] + t_d * disk[..., 1:2])
        beta_dir = inten * (jnp.pi * radius * radius / jnp.maximum(pmf, 1e-9))[:, None]

        # collimated (kind 3): doubly-delta — emit the beam ray itself
        # (reference: collimated.cpp sampleRay, power carried verbatim).
        beta_col = inten / jnp.maximum(pmf, 1e-9)[:, None]

        is_spot = kind == 1
        is_dir = kind == 2
        is_col = kind == 3
        d_pt = jnp.where(is_dir[:, None], jnp.broadcast_to(d_dir, d_sph.shape),
                         jnp.where(is_spot[:, None], d_cone, d_sph))
        d_pt = jnp.where(is_col[:, None], scene.pt_dir[sel_pt], d_pt)
        p_pt = jnp.where(is_dir[:, None], p_dir, scene.pt_pos[sel_pt])
        beta_k = jnp.where(is_dir[:, None], beta_dir,
                           jnp.where(is_spot[:, None], beta_spot, beta_pt))
        beta_k = jnp.where(is_col[:, None], beta_col, beta_k)
        pick = pick_pt
        out["p"] = jnp.where(pick[:, None], p_pt, out["p"])
        out["d"] = jnp.where(pick[:, None], d_pt, out["d"])
        out["n"] = jnp.where(pick[:, None], d_pt, out["n"])
        out["beta"] = jnp.where(pick[:, None], beta_k, out["beta"])
        out["from_area"] = jnp.where(pick, False, out["from_area"])
        out["valid"] = out["valid"] | pick
        out["Le"] = jnp.where(pick[:, None], 0.0, out["Le"])
        out["beta_A"] = jnp.where(pick[:, None], 0.0, out["beta_A"])
    return out


def camera_connect(scene, p: jnp.ndarray, width: int, height: int,
                   fov_axis: str = "x"):
    """Project world points onto the film of the perspective pinhole.

    Returns dict(pix [N], d [N,3] unit direction point→camera, dist, we,
    valid). ``we`` is the importance W·H/(4·tx·ty·cos³θ)/r² such that
    pixel_j += beta · f(ω to camera) · we estimates the same measurement
    as a camera ray through pixel j (see sensor.generate_rays for the
    screen mapping; reference: ptracer/capture.cpp + perspective.cpp).
    """
    rot = scene.cam_to_world[:3, :3]
    cam_o = scene.cam_to_world[:3, 3]
    v = p - cam_o
    d_cam = v @ rot  # R^T v
    z = d_cam[..., 2]
    aspect = width / height
    tan_half = scene.cam_tan_half_fov
    if fov_axis == "x":
        tx, ty = tan_half, tan_half / aspect
    else:
        tx, ty = tan_half * aspect, tan_half
    sx = d_cam[..., 0] / jnp.maximum(z, 1e-12) / tx
    sy = d_cam[..., 1] / jnp.maximum(z, 1e-12) / ty
    px = (1.0 - sx) * 0.5 * width
    py = (1.0 - sy) * 0.5 * height
    inside = (z > 1e-6) & (px >= 0) & (px < width) & (py >= 0) & (py < height)
    pix = jnp.clip(py.astype(jnp.int32), 0, height - 1) * width + jnp.clip(
        px.astype(jnp.int32), 0, width - 1
    )
    dist2 = jnp.sum(v * v, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    cos_t = z / dist
    we = (width * height) / (4.0 * tx * ty * jnp.maximum(cos_t, 1e-6) ** 3)
    we = we / jnp.maximum(dist2, 1e-12)
    return {
        "pix": pix, "d": -v / dist[:, None], "dist": dist,
        "we": jnp.where(inside, we, 0.0), "valid": inside,
    }


@partial(jax.jit, static_argnames=("n_paths", "width", "height", "max_depth",
                                   "rr_depth", "bsdf_types", "fov_axis"))
def trace_particles(
    scene, key, n_paths: int, width: int, height: int,
    max_depth: int = 10, rr_depth: int = 10,
    bsdf_types: tuple | None = None, fov_axis: str = "x",
):
    """One wave of light paths; returns the unnormalized film [n_pix, 3].

    Divide by the TOTAL number of paths (across waves) to develop.
    """
    n_pix = width * height
    k_e, k_w = jax.random.split(key)
    em = sample_emission(scene, k_e, n_paths)

    film = jnp.zeros((n_pix, 3))

    # Emission vertex seen by the camera (area lights only).
    cc0 = camera_connect(scene, em["p"], width, height, fov_axis)
    cos_e = jnp.sum(em["n"] * cc0["d"], axis=-1)
    o0 = em["p"] + em["n"] * jnp.where(cos_e > 0, RAY_EPS, -RAY_EPS)[:, None]
    occ0 = isect.occluded(scene, o0, cc0["d"], cc0["dist"] * (1.0 - 1e-3))
    c0 = em["beta_A"] * em["Le"] * (cc0["we"] * jnp.maximum(cos_e, 0.0))[:, None]
    good0 = em["valid"] & em["from_area"] & cc0["valid"] & ~occ0 & (cos_e > 0)
    film = film.at[cc0["pix"]].add(jnp.where(good0[:, None], c0, 0.0))

    def body(carry, inp):
        film, ro, rd, beta, active = carry
        depth, k = inp
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        active = active & hit["valid"]

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)

        # Connect this vertex to the camera.
        cc = camera_connect(scene, it["p"], width, height, fov_axis)
        wo_cam = to_local(s_ax, t_ax, n_ax, cc["d"])
        f, _ = bsdf_mod.eval_pdf_full(params, wi_local, wo_cam, types=bsdf_types)
        sh_o = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * cc["d"], axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        occ = isect.occluded(scene, sh_o, cc["d"], cc["dist"] * (1.0 - 1e-3))
        contrib = beta * f * cc["we"][:, None]
        good = active & cc["valid"] & ~occ
        film = film.at[cc["pix"]].add(jnp.where(good[:, None], contrib, 0.0))

        # Continue the walk.
        k_b, k_rr = jax.random.split(k)
        u0 = jax.random.uniform(jax.random.fold_in(k_b, 2), (n_paths,))
        u1 = jax.random.uniform(k_b, (n_paths,))
        u2 = jax.random.uniform(jax.random.fold_in(k_b, 1), (n_paths, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        beta = beta * bs["weight"]
        active = active & jnp.any(bs["weight"] > 0.0, axis=-1)
        do_rr = depth + 1 >= rr_depth
        u_rr = jax.random.uniform(k_rr, (n_paths,))
        q = jnp.clip(jnp.max(bs["weight"], axis=-1), 0.05, 0.95)
        kill = do_rr & (u_rr >= q)
        active = active & ~kill
        beta = jnp.where((do_rr & active)[:, None],
                         beta / jnp.maximum(q, 1e-6)[:, None], beta)
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ro_n = it["p"] + it["ng"] * jnp.where(
            wo_dot_geo > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        return (film, ro_n, wo_world, beta, active), None

    keys = jax.random.split(k_w, max_depth)
    init = (film, em["p"] + em["n"] * RAY_EPS, em["d"], em["beta"],
            em["valid"])
    (film, *_), _ = jax.lax.scan(
        body, init, (jnp.arange(max_depth, dtype=jnp.int32), keys)
    )
    return film


def render_ptracer(scene, cfg, spp: int = 16, seed: int = 1234,
                   paths_per_wave: int = 1 << 16):
    """Render via particle tracing; ``spp`` sets the light-path budget to
    spp·n_pixels (the reference's granularity accounting,
    ptracer.cpp sampleCount). Returns dict(image [H,W,3])."""
    import numpy as np

    w, h = cfg.width, cfg.height
    total = spp * w * h
    n_waves = max(1, (total + paths_per_wave - 1) // paths_per_wave)
    film = jnp.zeros((w * h, 3))
    key = jax.random.PRNGKey(seed)
    for i in range(n_waves):
        film = film + trace_particles(
            scene, jax.random.fold_in(key, i), paths_per_wave, w, h,
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
        )
    img = np.asarray(film / (n_waves * paths_per_wave)).reshape(h, w, 3)
    return {"image": img, "n_paths": n_waves * paths_per_wave}


def generate_vpls(scene, key, n_light_paths: int, max_depth: int,
                  bsdf_types: tuple | None = None):
    """Random-walk VPL generation (reference: librender/vpl.cpp
    generateVPLs): every light-path vertex becomes a virtual point light.

    Returns dict of [V,...] arrays with V = n_light_paths·(max_depth+1);
    row 0..n-1 are emitter VPLs (kind 0), the rest surface VPLs (kind 1).
    Weights are already divided by n_light_paths.
    """
    k_e, k_w = jax.random.split(key)
    em = sample_emission(scene, k_e, n_light_paths)
    inv_n = 1.0 / n_light_paths

    vpl_p = [em["p"]]
    vpl_n = [em["n"]]
    vpl_wi = [em["d"]]  # unused for emitter VPLs
    vpl_beta = [em["Le"] * em["beta_A"] * inv_n]
    vpl_kind = [jnp.zeros(n_light_paths, jnp.int32)]
    vpl_bsdf = [jnp.zeros(n_light_paths, jnp.int32)]
    vpl_uv = [jnp.zeros((n_light_paths, 2))]
    vpl_valid = [em["valid"] & em["from_area"]]

    ro = em["p"] + em["n"] * RAY_EPS
    rd = em["d"]
    beta = em["beta"]
    active = em["valid"]
    for depth in range(max_depth):
        k = jax.random.fold_in(k_w, depth)
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        active = active & hit["valid"]
        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        vpl_p.append(it["p"])
        vpl_n.append(it["ns"])
        vpl_wi.append(-rd)
        vpl_beta.append(beta * inv_n)
        vpl_kind.append(jnp.ones(n_light_paths, jnp.int32))
        vpl_bsdf.append(it["bsdf"])
        vpl_uv.append(it["uv"])
        vpl_valid.append(active & bsdf_mod.has_smooth(params))

        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        u0 = jax.random.uniform(jax.random.fold_in(k, 2), (n_light_paths,))
        u1 = jax.random.uniform(k, (n_light_paths,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n_light_paths, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        rd = to_world(s_ax, t_ax, n_ax, bs["wo"])
        beta = beta * bs["weight"]
        active = active & jnp.any(bs["weight"] > 0.0, axis=-1)
        ro = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * rd, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]

    cat = lambda xs: jnp.concatenate(xs, axis=0)  # noqa: E731
    return {
        "p": cat(vpl_p), "n": cat(vpl_n), "wi": cat(vpl_wi),
        "beta": cat(vpl_beta), "kind": cat(vpl_kind), "bsdf": cat(vpl_bsdf),
        "uv": cat(vpl_uv), "valid": cat(vpl_valid),
    }


@partial(jax.jit, static_argnames=("bsdf_types", "clamp_rel"))
def trace_vpl(scene, key, ro, rd, vpls, bsdf_types: tuple | None = None,
              clamp_rel: float = 0.05):
    """Instant-radiosity shading of a camera wave against a VPL set
    (reference: integrators/vpl/vpl.cpp). The r² singularity is clamped at
    ``clamp_rel``·scene-radius (the bias the method trades for smoothness;
    reference prop 'clamping')."""
    n = ro.shape[0]
    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    from ..scene import emitters

    li = jnp.where(hit["valid"][:, None],
                   emitters.eval_emitter(scene, it, -rd), 0.0)
    li = li + jnp.where(~hit["valid"][:, None],
                        emitters.env_eval(scene, rd), 0.0)

    params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
    s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
    wi_local = to_local(s_ax, t_ax, n_ax, -rd)
    on_surface = hit["valid"] & bsdf_mod.has_smooth(params)

    scene_r = 0.5 * jnp.linalg.norm(scene.aabb_hi - scene.aabb_lo)
    d_min2 = (clamp_rel * scene_r) ** 2

    V = vpls["p"].shape[0]

    def body(li, j):
        yp = vpls["p"][j]
        yn = vpls["n"][j]
        to_y = yp[None] - it["p"]
        r2 = jnp.sum(to_y * to_y, axis=-1)
        r = jnp.sqrt(jnp.maximum(r2, 1e-20))
        d = to_y / r[:, None]
        # f at the camera vertex (includes cosθ_x).
        wo_l = to_local(s_ax, t_ax, n_ax, d)
        f_x, _ = bsdf_mod.eval_pdf_full(params, wi_local, wo_l, types=bsdf_types)
        # factor at the VPL.
        cos_y = jnp.sum(yn[None] * -d, axis=-1)
        is_em = vpls["kind"][j] == 0
        # Emitter VPL: Le·cosθ_y; surface VPL: f_y (includes cosθ_y).
        pb = bsdf_mod.gather_params(
            scene, jnp.broadcast_to(vpls["bsdf"][j], (n,)),
            jnp.broadcast_to(vpls["uv"][j][None], (n, 2)), types=bsdf_types,
        )
        sy, ty, ny = shading_frame(pb, jnp.broadcast_to(yn[None], (n, 3)),
                                   jnp.broadcast_to(vpls["wi"][j][None], (n, 3)))
        wi_y = to_local(sy, ty, ny, jnp.broadcast_to(vpls["wi"][j][None], (n, 3)))
        wo_y = to_local(sy, ty, ny, -d)
        f_y, _ = bsdf_mod.eval_pdf_full(pb, wi_y, wo_y, types=bsdf_types)
        factor_y = jnp.where(is_em, jnp.maximum(cos_y, 0.0)[:, None], f_y)
        # Occlusion.
        sh_o = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * d, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        occ = isect.occluded(scene, sh_o, d, r * (1.0 - 1e-3))
        g = 1.0 / jnp.maximum(r2, d_min2)
        contrib = vpls["beta"][j][None] * f_x * factor_y * g[:, None]
        good = on_surface & vpls["valid"][j] & ~occ & (r2 > 1e-12)
        return li + jnp.where(good[:, None], contrib, 0.0), None

    li, _ = jax.lax.scan(body, li, jnp.arange(V))
    return li


def render_vpl(scene, cfg, spp: int = 4, seed: int = 1234,
               n_light_paths: int = 32, vpl_depth: int = 4):
    """VPL render: one global VPL set shared by all pixels
    (reference: vpl.cpp precomputes VPLs in preprocess())."""
    import jax as _jax

    from .renderer import render

    vpls = generate_vpls(
        scene, _jax.random.PRNGKey(seed ^ 0x5BD1), n_light_paths, vpl_depth,
        bsdf_types=cfg.bsdf_types or None,
    )
    return render(
        scene, cfg, spp=spp, seed=seed,
        trace_fn=lambda scene, key, ro, rd: trace_vpl(
            scene, key, ro, rd, vpls, bsdf_types=cfg.bsdf_types or None,
        ),
    )
