"""Wavefront unidirectional path tracer with optional NEE.

TPU-native re-design of the reference's ``volpath`` integrator with its added
``nee`` flag used for ground-truth renders
(reference: mitsuba/src/integrators/path/volpath.cpp:229,312;
test-suite/scenes/_integrators/gt.xml). The recursive per-pixel ``Li()``
becomes a ``lax.scan`` over bounce depth on a flat ray batch with active
masks; MIS uses the same power heuristic as the reference
(reference: miWeight, volpath.cpp).

Everything is pure JAX: the whole wave is differentiable w.r.t. scene
parameters (a capability the reference lacks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..core.frame import coordinate_system, normalize, to_local, to_world
from ..scene import emitters
from ..scene.scene import BSDF_DIELECTRIC
from . import intersect as isect

RAY_EPS = 1e-4


@jax.custom_vjp
def _clean_cotangent(x):
    """Identity whose BACKWARD strips non-finite cotangents.

    Reverse-mode differentiation of scene parameters that steer sampled
    directions (GGX roughness through the VNDF warp) flows cotangents
    back through the NEXT bounce's intersection geometry; edge-on hits
    there produce isolated inf cotangents (measure-zero boundary terms
    the interior-term estimator does not model) that would otherwise
    poison the shared parameter gradient. Forward values and well-behaved
    lanes' gradients are untouched; forward-mode (jvp) is exact either
    way."""
    return x


def _clean_fwd(x):
    return x, None


def _clean_bwd(_, g):
    return (jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0),)


_clean_cotangent.defvjp(_clean_fwd, _clean_bwd)


def mi_weight(pdf_a, pdf_b):
    """Power heuristic (beta=2), as the reference's miWeight."""
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0.0, a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-32), 0.0)


def shading_frame(params, ns, wi_world):
    """Local frame; flips the normal to wi's side for reflective models.

    The reference handles sideness per-BSDF (Frame::cosTheta(bRec.wi) < 0
    checks); we flip the frame for non-transmissive models (implicit
    `twosided`, reference: mitsuba/src/bsdfs/twosided.cpp) and keep the
    true normal for dielectrics.
    """
    cos_i = jnp.sum(ns * wi_world, axis=-1)
    from ..scene.scene import BSDF_HK, BSDF_NULL, BSDF_ROUGHDIELECTRIC

    transmissive = (
        (params["type"] == BSDF_DIELECTRIC)
        | (params["type"] == BSDF_ROUGHDIELECTRIC)
        | (params["type"] == BSDF_NULL)
        | (params["type"] == BSDF_HK)
    )
    flip = (cos_i < 0.0) & ~transmissive
    n = jnp.where(flip[..., None], -ns, ns)
    s, t = coordinate_system(n)
    return s, t, n


@partial(jax.jit, static_argnames=("max_depth", "rr_depth", "nee", "count_vertices", "bsdf_types", "has_medium", "has_hetero", "has_bump", "has_sss"))
def trace_wave(
    scene,
    key,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    max_depth: int = 10,
    rr_depth: int = 10,
    nee: bool = True,
    count_vertices: bool = False,
    bsdf_types: tuple | None = None,
    has_medium: bool = False,
    has_hetero: bool = False,
    has_bump: bool = False,
    has_sss: bool = False,
):
    """Trace a wave of rays; returns per-ray radiance [N, 3].

    max_depth follows the reference convention: number of bounces allowed
    (rRec.depth runs 1..maxDepth; depth counts path vertices). With
    ``count_vertices`` also returns the total number of path vertices
    (the reference's "rays" throughput unit, BASELINE.md).
    """
    n = ro.shape[0]
    pdf_over_area = emitters.tri_pdf_over_area(scene)

    def body(carry, inp):
        (ro, rd, throughput, eta_sq, active, li, prev_pdf, prev_delta, med_id) = carry
        depth, k = inp

        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        if has_bump:
            it["ns"] = isect.apply_bumpmap(scene, it)

        # --- Participating medium: free-flight sampling (reference:
        # volpath.cpp medium sampling; render/medium.py). Compiled out when
        # the scene has no medium. ---
        if has_medium:
            from . import medium as med

            k, k_med = jax.random.split(k)
            if has_hetero:
                # Woodcock tracking handles hetero AND homogeneous rows
                # (homogeneous = density 1, majorant 1).
                ms = med.sample_distance_hetero(
                    scene, med_id, k_med, ro, rd, hit["t"]
                )
            else:
                u_m = jax.random.uniform(k_med, (n,))
                ms = med.sample_distance(scene, med_id, u_m, hit["t"])
            scattered = active & ms["scattered"]
            throughput = throughput * jnp.where(
                active[..., None], ms["weight"], 1.0
            )
        else:
            scattered = jnp.zeros(n, dtype=bool)

        # Emitted radiance on hit, MIS-weighted against NEE of the previous
        # vertex (depth 0 or delta bounce → weight 1).
        le = emitters.eval_emitter(scene, it, -rd)
        if nee:
            pdf_nee = emitters.pdf_direct_hit(scene, pdf_over_area, it["tri"] if "tri" in it else hit["tri"], rd, hit["t"])
            w_hit = jnp.where(prev_delta | (depth == 0), 1.0, mi_weight(prev_pdf, pdf_nee))
        else:
            w_hit = jnp.ones(n)
        li = li + jnp.where(
            (active & ~scattered)[..., None], throughput * le * w_hit[..., None], 0.0
        )

        # Environment on miss; image envmaps are MIS-weighted against the
        # NEE envmap CDF (reference: envmap.cpp pdfDirection + miWeight in
        # volpath.cpp). Constant environments have no NEE branch -> weight 1.
        if nee and scene.env_pdf.shape[0] > 1:
            pdf_env_nee = emitters.pdf_env_dir(scene, rd) * scene.env_select_prob
            w_env = jnp.where(
                prev_delta | (depth == 0), 1.0, mi_weight(prev_pdf, pdf_env_nee)
            )
        else:
            w_env = jnp.ones(n)
        li = li + jnp.where(
            (active & ~scattered & ~hit["valid"])[..., None],
            throughput * emitters.env_eval(scene, rd) * w_env[..., None], 0.0,
        )

        # Dipole subsurface exitance: added like emission but never MIS'd
        # (reference: SamplingIntegrator adds its.LoSub at each hit;
        # render/subsurface.py).
        if has_sss:
            from .subsurface import sss_lo_factor

            li = li + jnp.where(
                (active & ~scattered)[..., None],
                throughput * sss_lo_factor(scene, it, -rd), 0.0,
            )

        on_surface = active & hit["valid"] & ~scattered
        active = active & (hit["valid"] | scattered)
        n_shaded = jnp.sum(active.astype(jnp.int32))

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)

        # Strict normals: kill paths where geometric/shading sides disagree.
        # Pass-through surfaces (null boundaries, masks) are exempt: they
        # legitimately see both sides (reference: mask/null have
        # transmission lobes on either side).
        wi_dot_geo = jnp.sum(it["ng"] * -rd, axis=-1)
        from ..scene.scene import BSDF_NULL as _NULL

        cullable = params["type"] != _NULL
        if "is_mask" in params:
            cullable = cullable & ~params["is_mask"]
        on_surface = on_surface & ~(
            cullable & (wi_dot_geo * wi_local[..., 2] < 0.0)
        )
        active = on_surface | scattered

        k_nee, k_b1, k_b2, k_rr = jax.random.split(k, 4)

        # --- Next-event estimation ---
        if nee:
            u1 = jax.random.uniform(k_nee, (n,))
            u2 = jax.random.uniform(jax.random.fold_in(k_nee, 1), (n, 2))
            ls = emitters.sample_direct(scene, it["p"], u1, u2)
            wo_l = to_local(s_ax, t_ax, n_ax, ls["d"])
            f, pdf_b = bsdf_mod.eval_pdf_full(params, wi_local, wo_l, types=bsdf_types)
            smooth = bsdf_mod.has_smooth(params)
            # NEE's light vertex sits one segment past this one; the
            # reference breaks before NEE once depth >= maxDepth
            # (volpath.cpp), so gate it or NEE counts one extra bounce.
            cand = (
                on_surface & ls["valid"] & smooth & (ls["pdf"] > 0.0)
                & (depth + 2 <= max_depth)
            )
            shadow_o = it["p"] + it["ng"] * jnp.where(
                jnp.sum(it["ng"] * ls["d"], axis=-1) > 0, RAY_EPS, -RAY_EPS
            )[..., None]
            occ = isect.occluded(scene, shadow_o, ls["d"], ls["dist"] * (1.0 - 1e-3))
            # Delta lights (point) cannot be hit by BSDF sampling → weight 1.
            w = jnp.where(ls["delta"], 1.0, mi_weight(ls["pdf"], pdf_b))
            contrib = (
                throughput
                * f
                * ls["radiance"]
                * (w / jnp.maximum(ls["pdf"], 1e-20))[..., None]
            )
            if has_medium:
                if has_hetero:
                    contrib = contrib * med.transmittance_hetero(
                        scene, med_id, jax.random.fold_in(k_nee, 2),
                        it["p"], ls["d"], ls["dist"],
                    )
                else:
                    contrib = contrib * med.transmittance(
                        scene, med_id, ls["dist"]
                    )
            li = li + jnp.where((cand & ~occ)[..., None], contrib, 0.0)

        # --- Medium interaction: NEE + phase sampling ---
        if has_medium:
            g_ray = scene.med_g[med_id]
            p_med = ro + ms["t"][:, None] * rd
            k, k_mn, k_mp = jax.random.split(k, 3)
            if nee:
                u1m = jax.random.uniform(k_mn, (n,))
                u2m = jax.random.uniform(jax.random.fold_in(k_mn, 1), (n, 2))
                lsm = emitters.sample_direct(scene, p_med, u1m, u2m)
                cosm = jnp.sum(rd * lsm["d"], axis=-1)
                f_ph = med.hg_pdf(g_ray, cosm)
                occ_m = isect.occluded(
                    scene, p_med, lsm["d"], lsm["dist"] * (1.0 - 1e-3)
                )
                w_m = jnp.where(
                    lsm["delta"], 1.0, mi_weight(lsm["pdf"], f_ph)
                )
                tr_m = (
                    med.transmittance_hetero(
                        scene, med_id, jax.random.fold_in(k_mn, 2),
                        p_med, lsm["d"], lsm["dist"],
                    )
                    if has_hetero
                    else med.transmittance(scene, med_id, lsm["dist"])
                )
                contrib_m = (
                    throughput
                    * lsm["radiance"]
                    * tr_m
                    * (f_ph * w_m / jnp.maximum(lsm["pdf"], 1e-20))[..., None]
                )
                cand_m = (
                    scattered & lsm["valid"] & (lsm["pdf"] > 0.0)
                    & (depth + 2 <= max_depth)
                )
                li = li + jnp.where((cand_m & ~occ_m)[..., None], contrib_m, 0.0)
            u_ph = jax.random.uniform(k_mp, (n, 2))
            d_med, pdf_med_dir = med.hg_sample(g_ray, rd, u_ph)

        # --- BSDF sampling ---
        u0 = jax.random.uniform(jax.random.fold_in(k_b1, 1), (n,))
        u1 = jax.random.uniform(k_b1, (n,))
        u2 = jax.random.uniform(k_b2, (n, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        # Strict normals on the outgoing side.
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        good = jnp.any(bs["weight"] > 0.0, axis=-1) & (
            bs["pass"] | ~(wo_dot_geo * bs["wo"][..., 2] <= 0.0)
        )
        active = (on_surface & good) | scattered
        throughput = throughput * jnp.where(
            scattered[..., None], 1.0, bs["weight"]
        )
        eta_sq = eta_sq * jnp.where(scattered, 1.0, bs["eta"] * bs["eta"])

        # Russian roulette after rr_depth bounces (reference: sdmm_proc.cpp:858).
        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(throughput, axis=-1) * eta_sq, 0.95)
        )  # detached RR probability (unbiased gradient estimator)
        do_rr = depth + 1 >= rr_depth
        u_rr = jax.random.uniform(k_rr, (n,))
        kill = do_rr & (u_rr >= q)
        active = active & ~kill
        throughput = jnp.where(
            (do_rr & active)[..., None], throughput / jnp.maximum(q, 1e-6)[..., None], throughput
        )

        offset_sign = jnp.where(wo_dot_geo > 0, RAY_EPS, -RAY_EPS)
        wo_world = _clean_cotangent(wo_world)
        ro_next = _clean_cotangent(it["p"] + it["ng"] * offset_sign[..., None])
        next_pdf = bs["pdf"]
        next_delta = bs["delta"]
        if has_medium:
            # Boundary crossing switches the ray's medium (reference:
            # RadianceQueryRecord.medium updates in volpath.cpp).
            med_id = med.update_medium(
                scene, med_id, hit["tri"], wi_dot_geo, wo_dot_geo,
                on_surface & active,
            )
            ro_next = jnp.where(scattered[..., None], p_med, ro_next)
            wo_world = jnp.where(scattered[..., None], d_med, wo_world)
            next_pdf = jnp.where(scattered, pdf_med_dir, next_pdf)
            next_delta = jnp.where(scattered, False, next_delta)
        return (
            (ro_next, wo_world, throughput, eta_sq, active, li, next_pdf,
             next_delta, med_id),
            n_shaded if count_vertices else None,
        )

    keys = jax.random.split(key, max_depth)
    init = (
        ro,
        rd,
        jnp.ones((n, 3)),
        jnp.ones((n,)),
        jnp.ones((n,), dtype=bool),
        jnp.zeros((n, 3)),
        jnp.ones((n,)),
        jnp.ones((n,), dtype=bool),
        jnp.full((n,), scene.ambient_med, dtype=jnp.int32),
    )
    depths = jnp.arange(max_depth, dtype=jnp.int32)
    carry, ys = jax.lax.scan(body, init, (depths, keys))
    if count_vertices:
        return carry[5], jnp.sum(ys)
    return carry[5]
