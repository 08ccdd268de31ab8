"""Guided wavefront path tracer with SDMM directional sampling + training
sample collection.

TPU-native re-design of the reference's SDMM integrator hot loop
(reference: mitsuba/src/integrators/sdmm/sdmm_proc.cpp — ``Li`` :592,
``sampleSurface`` :275, ``pdfSurface`` :510, vertex radiance recording
:606-637, post-path sample pushes :876-965). Differences by design:

- One ``lax.scan`` over bounce depth for a whole ray wave instead of
  per-pixel recursion; per-depth stacked outputs replace the ``vertices``
  array, and the vertex incident-radiance recursion I_d = value_d +
  w_{d+1}·I_{d+1} becomes a backward scan after tracing.
- Mixture conditioning/sampling/pdf are dense gathers + batched linear
  algebra over the ``[N, K]`` wave — the reference's enoki packets over
  components become the trailing K axis.
- NEE is compiled out, MIS weight ≡ 1, exactly like the reference's built
  configuration (sdmm_proc.cpp:700 #ifdef NEE, :816).
- Sample collection emits flat arrays (canonical 6D sample, normal, weight,
  pdf-clamped) — the lock-guarded per-leaf push_back becomes a post-hoc
  segment-sum in the EM (guiding/em.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..core.frame import to_local, to_world
from ..guiding import mixture as mix
from ..guiding import stree
from ..scene import emitters
from .intersect import intersect, surface_interaction
from .volpath import shading_frame

RAY_EPS = 1e-4
PDF_CLAMP = 0.1  # reference: sdmm_proc.cpp:822 max(misPdf, 0.1)


class GuideState(NamedTuple):
    """Device-side guiding cache (the reference's STree-of-SDMMContexts)."""

    sdmm: mix.SDMM  # [L, K]
    prep: mix.Prepared
    initialized: jnp.ndarray  # [L] bool — leaf has a trained mixture
    tables: dict  # STree device tables
    aabb_lo: jnp.ndarray  # [3] world-space scene AABB min
    inv_norm: jnp.ndarray  # [] 1 / spatialNormalization
    learned: dict | None = None  # learned-BSDF DMM table (product sampling)
    packed: jnp.ndarray | None = None  # [L, C] row-packed conditioning
    # params (mix.pack_conditioning): ONE wide per-ray gather instead of
    # ten narrow ones — XLA TPU gathers are ~per-row-serial.
    kernel_table: jnp.ndarray | None = None  # [L, C'] packed rows for the
    # Pallas guided-sampling kernel (ops/guided_pallas.pack_guided_rows,
    # transposed): conditioning + sample + pdf fused in VMEM.


def canonical(gs: GuideState, p: jnp.ndarray) -> jnp.ndarray:
    """World position → canonical guiding coordinates
    (reference: createCondition, sdmm_proc.cpp:263-273)."""
    return (p - gs.aabb_lo) * gs.inv_norm


def _gather_prep(prep: mix.Prepared, leaf: jnp.ndarray) -> mix.Prepared:
    return jax.tree.map(lambda x: x[leaf], prep)


def _lookup_conditioning(gs: GuideState, leaf: jnp.ndarray):
    """Per-ray (weight_g, prep_g, use_guide) leaf lookup — packed single
    gather when gs.packed is set, pytree gathers otherwise."""
    if gs.packed is not None:
        return mix.unpack_conditioning(
            gs.packed[leaf], gs.sdmm.weight.shape[-1]
        )
    return gs.sdmm.weight[leaf], _gather_prep(gs.prep, leaf), gs.initialized[leaf]


@partial(jax.jit, static_argnames=(
    "max_depth", "rr_depth", "bsdf_fraction", "bsdf_types",
    "saved_samples_per_path", "has_medium", "has_hetero",
))
def trace_wave_guided(
    scene,
    gs: GuideState,
    key,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    max_depth: int = 10,
    rr_depth: int = 10,
    bsdf_fraction: float = 0.5,
    bsdf_types: tuple | None = None,
    saved_samples_per_path: int = 8,
    has_medium: bool = False,
    has_hetero: bool = False,
):
    """Trace one guided wave.

    Returns (li [N,3], samples dict with flat [N·D] arrays).

    ``has_medium``: volumetric transport for the guided integrator
    (VERDICT r3 #4). The reference's volpath_sdmm handles media as
    transmittance on emitter/env lookups + index-matched transition
    chains with medium switches (sdmm_proc.cpp:665-666, 790-801,
    995-1053) — it never performs in-medium scattering in the guided
    loop. Here the medium path is the FULL volpath machinery instead
    (free-flight distance sampling, HG phase scattering, boundary medium
    switches; render/medium.py), which subsumes the reference's
    attenuation-only transport and compounds transmittance correctly
    across multiple in-medium segments. Guided sampling and vertex
    recording remain surface-only, exactly like the reference.
    """
    n = ro.shape[0]
    d_slots = max_depth

    def body(carry, inp):
        (ro, rd, throughput, eta_sq, active, li, med_id) = carry
        depth, k = inp

        hit = intersect(scene, ro, rd)
        it = surface_interaction(scene, ro, rd, hit)

        if has_medium:
            from . import medium as med

            k, k_med = jax.random.split(k)
            if has_hetero:
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
            med_w_out = jnp.where(active[..., None], ms["weight"], 1.0)
        else:
            scattered = jnp.zeros(n, dtype=bool)
            med_w_out = jnp.ones((n, 3))

        # Emitted radiance (MIS weight 1; reference sdmm_proc.cpp:816).
        # The scan runs ONE step past max_depth so the backward pass has
        # le at vertex d+1 for the last recorded vertex's incident
        # radiance; that extra vertex must NOT contribute to the image
        # (reference: the Li loop breaks at depth > maxDepth, :649).
        # le_eff folds the environment radiance of escaped rays in, so the
        # recorded vertex radiance sees env light too (reference:
        # rayIntersectAndLookForEmitter handles envmaps, sdmm_proc.cpp:995).
        in_depth = depth < max_depth
        # Path-length numerator BEFORE the hit mask: each live step is one
        # increment of the reference's rRec.depth — a hit counts the
        # surface vertex, a miss counts the terminal escape segment
        # (reference avgPathLength += rRec.depth, sdmm_proc.cpp:873-874).
        n_vert_step = jnp.sum((active & in_depth).astype(jnp.float32))
        le = emitters.eval_emitter(scene, it, -rd)
        le_eff = le + jnp.where(
            hit["valid"][..., None], 0.0, emitters.env_eval(scene, rd)
        )
        # A medium scatter event happens BEFORE the surface: its emitter
        # is not reached this step (reference attenuates emitter lookups
        # by transmittance, sdmm_proc.cpp:995-1053; here the free-flight
        # sample subsumes the attenuation).
        le_eff = jnp.where(scattered[..., None], 0.0, le_eff)
        li = li + jnp.where(
            (active & in_depth)[..., None], throughput * le_eff, 0.0
        )
        le_out = jnp.where(active[..., None], le_eff, 0.0)
        active = active & (hit["valid"] | scattered)
        on_surface = active & ~scattered

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        wi_dot_geo = jnp.sum(it["ng"] * -rd, axis=-1)
        on_surface = on_surface & ~(wi_dot_geo * wi_local[..., 2] < 0.0)
        active = on_surface | scattered

        # --- Guided sampling (sampleSurface, sdmm_proc.cpp:275) ---
        c_pos = canonical(gs, it["p"])
        leaf = stree.find_leaf(gs.tables, c_pos)
        weight_g, prep_g, use_guide = _lookup_conditioning(gs, leaf)
        cond = mix.create_conditional(prep_g, weight_g, c_pos)
        delta_only = bsdf_mod.is_delta_only(params)
        guide_ok = use_guide & cond.valid & ~delta_only

        # Optional learned-BSDF product sampling
        # (reference: sampleProduct, sdmm_proc.cpp:327-381).
        if gs.learned is not None:
            from ..guiding.learned_bsdf import to_world_conditional

            from ..guiding.learned_bsdf import PRODUCT_TOP_K

            learned_cond, has_dmm = to_world_conditional(
                gs.learned, it["bsdf"], s_ax, t_ax, n_ax, wi_local
            )
            # Top-k pruned conditional (reference: create_conditional_pruned
            # with top_k=2): products are K_guide x 2, not K_guide x K_bsdf.
            prod = mix.product(
                cond, mix.prune_conditional(learned_cond, PRODUCT_TOP_K)
            )
            use_product = guide_ok & has_dmm & prod.valid
        else:
            use_product = jnp.zeros(n, dtype=bool)
            prod = None

        # One-sample MIS weight between BSDF and mixture sampling
        # (reference heuristic weights {1, .5, .3, 0}, sdmm_proc.cpp:383-392).
        h = jnp.where(guide_ok, bsdf_fraction, 1.0)
        h = jnp.where(use_product, 0.3, h)

        k_sel, k_b1, k_b2, k_g, k_rr = jax.random.split(k, 5)
        u_sel = jax.random.uniform(k_sel, (n,))
        take_bsdf = (u_sel < h) | ~guide_ok

        # Branch A: BSDF importance sampling.
        u1 = jax.random.uniform(k_b1, (n,))
        u2 = jax.random.uniform(k_b2, (n, 2))
        u0 = jax.random.uniform(jax.random.fold_in(k_b1, 7), (n,))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)

        # Branch B: mixture directional sampling (world space).
        d_guide, g_ok = mix.conditional_sample(cond, k_g)
        if prod is not None:
            d_prod, p_ok = mix.conditional_sample(prod, jax.random.fold_in(k_g, 1))
            d_guide = jnp.where(use_product[..., None], d_prod, d_guide)
            g_ok = jnp.where(use_product, p_ok, g_ok)
        wo_guide_local = to_local(s_ax, t_ax, n_ax, d_guide)

        wo_local = jnp.where(take_bsdf[..., None], bs["wo"], wo_guide_local)
        wo_world = jnp.where(
            take_bsdf[..., None], to_world(s_ax, t_ax, n_ax, bs["wo"]), d_guide
        )
        sampled_delta = take_bsdf & bs["delta"]

        # Combined pdf for non-delta samples: h·bsdfPdf + (1−h)·gmmPdf
        # (pdfSurface, sdmm_proc.cpp:587-589).
        f_eval, bsdf_pdf_eval = bsdf_mod.eval_pdf_full(params, wi_local, wo_local, types=bsdf_types)
        gmm_pdf = jnp.where(guide_ok, mix.conditional_pdf(cond, wo_world), 0.0)
        if prod is not None:
            prod_pdf = mix.conditional_pdf(prod, wo_world)
            gmm_pdf = jnp.where(use_product, prod_pdf, gmm_pdf)
        mis_pdf = h * bsdf_pdf_eval + (1.0 - h) * gmm_pdf

        # Per-branch throughput weight:
        # - delta BSDF sample: bs.weight / h  (reference :401-405)
        # - smooth: f·cos / mis_pdf
        w_smooth = f_eval / jnp.maximum(mis_pdf, 1e-20)[..., None]
        w_delta = bs["weight"] / jnp.maximum(h, 1e-6)[..., None]
        bweight = jnp.where(sampled_delta[..., None], w_delta, w_smooth)
        ok_sample = jnp.where(
            sampled_delta,
            jnp.any(bs["weight"] > 0.0, axis=-1),
            (mis_pdf > 0.0)
            & jnp.any(f_eval > 0.0, axis=-1)
            & (take_bsdf | g_ok),
        )

        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ok_sample = ok_sample & ~(wo_dot_geo * wo_local[..., 2] <= 0.0)
        active_next = (on_surface & ok_sample) | scattered

        # Conditional success accounting (reference: percentage of found
        # conditionals, sdmm_proc.cpp:187-194 avgFoundConditional).
        cond_try = on_surface & use_guide & ~delta_only
        cond_ok = cond_try & cond.valid

        # Vertex record (reference Vertex, sdmm_proc.cpp:606-637);
        # medium scatter events are never recorded (surface-only guiding,
        # like the reference).
        clamped_pdf = jnp.maximum(mis_pdf, PDF_CLAMP)
        cacheable = on_surface & ok_sample & ~sampled_delta
        normal = jnp.where(
            (wi_local[..., 2] < 0.0)[..., None], -it["ns"], it["ns"]
        )

        surf_cont = on_surface & ok_sample
        throughput = throughput * jnp.where(surf_cont[..., None], bweight, 1.0)
        throughput = jnp.where(active_next[..., None], throughput, 0.0)
        eta_sq = eta_sq * jnp.where(surf_cont, bs["eta"] * bs["eta"], 1.0)

        if has_medium:
            # HG phase scattering at medium events (reference scatters
            # via the phase function; perfectly importance-sampled so the
            # direction weight is 1 — the albedo is in ms.weight).
            g_ray = scene.med_g[med_id]
            p_med = ro + ms["t"][:, None] * rd
            u_ph = jax.random.uniform(jax.random.fold_in(k_g, 3), (n, 2))
            d_med, _ = med.hg_sample(g_ray, rd, u_ph)

        # Russian roulette.
        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(throughput, axis=-1) * eta_sq, 0.95)
        )  # detached RR probability (unbiased gradient estimator)
        do_rr = depth + 1 >= rr_depth
        u_rr = jax.random.uniform(k_rr, (n,))
        kill = do_rr & (u_rr >= q)
        active_next = active_next & ~kill
        throughput = jnp.where(
            (do_rr & active_next)[..., None],
            throughput / jnp.maximum(q, 1e-6)[..., None],
            throughput,
        )

        ro_next = it["p"] + it["ng"] * jnp.where(wo_dot_geo > 0, RAY_EPS, -RAY_EPS)[..., None]
        if has_medium:
            # Boundary crossings switch the ray's medium (reference:
            # index-matched transitions, sdmm_proc.cpp:790-801).
            med_id = med.update_medium(
                scene, med_id, hit["tri"], wi_dot_geo, wo_dot_geo,
                surf_cont & active_next,
            )
            ro_next = jnp.where(scattered[..., None], p_med, ro_next)
            wo_world = jnp.where(scattered[..., None], d_med, wo_world)
        # The backward vertex-radiance recursion sees the TOTAL per-step
        # factor: segment medium weight (transmittance estimator) x the
        # bounce weight (1 for phase scatters, perfectly sampled).
        step_w = med_w_out * jnp.where(surf_cont[..., None], bweight, 1.0)
        outs = {
            # Segment-attenuated emitter radiance at this step's event.
            "le": med_w_out * le_out,
            "bweight": jnp.where(active_next[..., None], step_w, 0.0),
            "pdf": clamped_pdf,
            "cacheable": cacheable,
            "sample_pos": c_pos,
            "sample_dir": wo_world,
            "normal": normal,
            "n_cond_try": jnp.sum(cond_try.astype(jnp.float32)),
            "n_cond_ok": jnp.sum(cond_ok.astype(jnp.float32)),
            "n_vert": n_vert_step,
        }
        return (ro_next, wo_world, throughput, eta_sq, active_next, li,
                med_id), outs

    keys = jax.random.split(key, d_slots + 1)
    init = (
        ro, rd, jnp.ones((n, 3)), jnp.ones((n,)),
        jnp.ones((n,), dtype=bool), jnp.zeros((n, 3)),
        jnp.full((n,), scene.ambient_med, dtype=jnp.int32),
    )
    depths = jnp.arange(d_slots + 1, dtype=jnp.int32)
    carry, outs = jax.lax.scan(body, init, (depths, keys))
    li = carry[5]

    # Backward recursion for vertex incident radiance:
    # I_d = le[d+1] + bweight[d+1] · I_{d+1}  (reference Vertex::record).
    def back(carry_i, xs):
        le_next, w_next = xs
        incident = le_next + w_next * carry_i
        return incident, incident

    le_s = outs["le"]  # [D+1, N, 3]
    w_s = outs["bweight"]
    _, incident = jax.lax.scan(
        back,
        jnp.zeros((n, 3)),
        (le_s[1:][::-1], w_s[1:][::-1]),
    )
    incident = incident[::-1]  # [D, N, 3]; incident[d] = I_d

    inv_pdf = 1.0 / outs["pdf"][:d_slots]  # [D, N]
    weight_rgb = incident * inv_pdf[..., None]
    sample_weight = jnp.mean(weight_rgb, axis=-1)  # average over channels
    valid = (
        outs["cacheable"][:d_slots]
        & jnp.isfinite(sample_weight)
        & (sample_weight >= 0.0)
    )
    # Only the last savedSamplesPerPath vertices of each path are recorded
    # (reference: firstSaved = max(depth - savedSamplesPerPath, 0),
    # sdmm_proc.cpp:916-918); the path-terminal vertex additionally gets a
    # jittered cross-leaf replica in the trainer (:932).
    rev_rank = jnp.cumsum(valid[::-1].astype(jnp.int32), axis=0)[::-1]
    terminal = valid & (rev_rank == 1)
    valid = valid & (rev_rank <= saved_samples_per_path)

    # Invalid slots (missed rays, delta vertices) may hold inf/NaN positions;
    # sanitize so they cannot poison downstream segment-sums.
    safe_pos = jnp.where(valid[..., None], outs["sample_pos"][:d_slots], 0.5)
    safe_dir = jnp.where(
        valid[..., None], outs["sample_dir"][:d_slots], jnp.array([0.0, 0.0, 1.0])
    )
    samples = {
        "n_cond_try": jnp.sum(outs["n_cond_try"]),
        "n_cond_ok": jnp.sum(outs["n_cond_ok"]),
        "n_vertices": jnp.sum(outs["n_vert"]),
        "pos": jnp.nan_to_num(safe_pos, nan=0.5, posinf=0.5, neginf=0.5).reshape(-1, 3),
        "dir": safe_dir.reshape(-1, 3),
        "normal": jnp.nan_to_num(outs["normal"][:d_slots]).reshape(-1, 3),
        # weight < 0 marks invalid slots for the EM (guiding/em.py e_step).
        "weight": jnp.where(valid, sample_weight, -1.0).reshape(-1),
        "valid": valid.reshape(-1),
        "terminal": terminal.reshape(-1),
    }
    return li, samples


# ---------------------------------------------------------------------------
# Regenerating-pool guided renderer (no sample collection).
#
# The scan-based trace_wave_guided keeps lane occupancy tied to the path
# survival curve (see render/wavefront.py's rationale: mean path length
# ~3.5 of max_depth 10 leaves >60% of lanes idle late). Training iterations
# need per-vertex sample records and keep the scan; the pure-render
# iterations — 3/4 of the budget (reference trains on the first quarter,
# volpath_sdmm.cpp:416) — regenerate dead lanes from a global sample
# counter exactly like render_pool.

# f32 state columns (no ppdf: the reference's guided tracer uses MIS
# weight ≡ 1 on emitter hits, sdmm_proc.cpp:816).
_RO = slice(0, 3)
_RD = slice(3, 6)
_THR = slice(6, 9)
_LI = slice(9, 12)
_ETA2 = 12
_NCOLS = 13

_DEPTH_SHIFT = 20
_ALIVE = 1 << 24
_EXH = 1 << 25
_PIX_MASK = (1 << 20) - 1
_DEPTH_MASK = 0xF
# Per-lane medium id for the media-capable pool (render_pool_guided
# has_medium=True): meta bits 26-29 (up to 16 media rows).
_MED_SHIFT = 26
_MED_MASK = 0xF


def render_pool_guided(
    scene,
    gs: GuideState,
    key,
    n_lanes: int,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    bsdf_fraction: float = 0.5,
    bsdf_types: tuple | None = None,
    fov_axis: str = "x",
    use_kernel: bool = False,
    collect_cap: int = 0,
    saved_samples_per_path: int = 8,
    has_medium: bool = False,
    has_hetero: bool = False,
):
    """See _render_pool_guided_impl. This wrapper keeps the sample
    finalization in a SEPARATE jit: inside one jit, XLA's layout
    assignment gave the [cap,16] sample buffer an attribute-major {0,1}
    layout (driven by the finalize column slices), which made the
    per-step emission scatter touch 16 tiles per row — 12.4 ms/step
    measured vs 1.3 ms for the row-major film scatter. The jit boundary
    pins the buffers to standard row-major layouts."""
    out = dict(_render_pool_guided_impl(
        scene, gs, key, n_lanes, spp, width, height, max_depth, rr_depth,
        bsdf_fraction, bsdf_types, fov_axis, use_kernel, collect_cap,
        saved_samples_per_path, has_medium, has_hetero,
    ))
    if collect_cap > 0:
        samp, path_rad, cursor = out.pop("_collect_raw")
        out["samples"] = _finalize_collect(
            samp, path_rad, cursor, out["n_cond_try"], out["n_cond_ok"],
            out["n_vertices"], saved_samples_per_path,
        )
        out["n_emitted"] = cursor
    return out


@partial(jax.jit, static_argnames=(
    "n_lanes", "spp", "width", "height", "max_depth", "rr_depth",
    "bsdf_fraction", "bsdf_types", "fov_axis", "use_kernel",
    "collect_cap", "saved_samples_per_path", "has_medium", "has_hetero",
))
def _render_pool_guided_impl(
    scene,
    gs: GuideState,
    key,
    n_lanes: int,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    bsdf_fraction: float = 0.5,
    bsdf_types: tuple | None = None,
    fov_axis: str = "x",
    use_kernel: bool = False,
    collect_cap: int = 0,
    saved_samples_per_path: int = 8,
    has_medium: bool = False,
    has_hetero: bool = False,
):
    """Guided render of width×height at spp with a regenerating lane pool.

    Returns dict(image, sqr, weight [flat n_pix…], n_vertices, steps).
    Estimator-identical to looping trace_wave_guided over waves (same
    one-sample-MIS, same pdf mix), minus the training-sample outputs.

    ``use_kernel``: run conditioning + sample + pdf in the Pallas guided
    kernel (ops/guided_pallas) instead of the XLA mixture path — TPU
    only; requires gs.kernel_table and no learned-product sampling.

    ``collect_cap`` > 0 additionally records training vertex samples (the
    pooled replacement for the scan tracer's sample output — VERDICT r3
    item #1; reference: in-loop vertex recording, sdmm_proc.cpp:876-965).
    Instead of per-lane vertex rings flushed at path death, each recorded
    vertex is emitted IMMEDIATELY into a ``[collect_cap, 16]`` buffer with
    its (canonical pos, direction, clamped pdf, post-vertex throughput,
    radiance-so-far snapshot, path id, per-path vertex seq); a second
    ``[n_paths, 3]`` buffer logs each path's final training radiance at
    death. The vertex incident radiance is then reconstructed OUTSIDE the
    loop from the telescoping identity
        I_d = (L_path − L_snap_d) / thr_d
    (componentwise; thr_d is the throughput that multiplies all later
    emitter hits), which equals the scan tracer's backward recursion
    le_{d+1} + w_{d+1}·I_{d+1} — except that RR survival compensation
    (1/q) IS included here (the standard unbiased estimator; the scan
    omits it — only affects vertices deeper than rr_depth). Paths run one
    extra bounce past max_depth for the last vertex's radiance target,
    exactly like the scan; the extra vertex never reaches the image.
    Returns an extra ``samples`` dict (pos/dir/weight/valid/terminal)
    shaped ``[collect_cap]`` plus ``n_emitted`` for overflow accounting.
    """
    from ..scene.sensor import generate_rays

    COLLECT = collect_cap > 0
    extra = 1 if COLLECT else 0
    S = saved_samples_per_path

    if use_kernel:
        assert gs.kernel_table is not None and gs.learned is None
        assert n_lanes % 1024 == 0, n_lanes
        from ..ops import guided_pallas as _gp_mod

        _interp = jax.default_backend() != "tpu"
        gp = type("GP", (), {"guided_sample": staticmethod(
            lambda *a: _gp_mod.guided_sample(*a, interpret=_interp)
        )})

    n_pix = width * height
    assert n_pix <= _PIX_MASK
    assert max_depth <= _DEPTH_MASK + 1
    total = n_pix * spp

    def cond_fn(c):
        meta = c["meta"]
        return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

    def body(c):
        k = jax.random.fold_in(key, c["step"])
        k_regen, k_sel, k_b1, k_b2, k_g, k_rr = jax.random.split(k, 6)

        st = c["state"]
        meta = c["meta"]
        alive = (meta & _ALIVE) != 0
        exhausted = (meta & _EXH) != 0
        pix = meta & _PIX_MASK
        depth0 = (meta >> _DEPTH_SHIFT) & _DEPTH_MASK
        if has_medium:
            med_id = (meta >> _MED_SHIFT) & _MED_MASK

        # --- Regenerate dead lanes (global counter; see render_pool) ---
        need = ~alive & ~exhausted
        rank = jnp.cumsum(need.astype(jnp.int32)) - 1
        g = c["cursor"] + rank
        in_budget = need & (g < total)
        pix_n = jnp.where(in_budget, g % n_pix, 0)
        u = jax.random.uniform(k_regen, (n_lanes, 2))
        px = (pix_n % width).astype(jnp.float32) + u[:, 0]
        py = (pix_n // width).astype(jnp.float32) + u[:, 1]
        ro_n, rd_n = generate_rays(
            scene, jnp.stack([px, py], axis=-1), width, height, fov_axis
        )
        start = in_budget
        exhausted = exhausted | (need & ~in_budget)
        c["cursor"] = c["cursor"] + jnp.sum(start.astype(jnp.int32))
        pix = jnp.where(start, pix_n, pix)
        if has_medium:
            med_id = jnp.where(start, scene.ambient_med, med_id)
        ncols = _NCOLS + (3 if COLLECT else 0)
        fresh = jnp.concatenate([
            ro_n, rd_n, jnp.ones((n_lanes, 3)), jnp.zeros((n_lanes, 3)),
            jnp.ones((n_lanes, 1)),
        ] + ([jnp.zeros((n_lanes, 3))] if COLLECT else []), axis=-1)
        st = jnp.where(start[:, None], fresh, st)
        depth0 = jnp.where(start, 0, depth0)
        alive = alive | start
        if COLLECT:
            # path id = the global sample counter value assigned at regen;
            # indexes the per-path final-radiance buffer.
            c["path_id"] = jnp.where(start, jnp.where(in_budget, g, 0),
                                     c["path_id"])
            c["seq"] = jnp.where(start, 0, c["seq"])

        ro = st[:, _RO]
        rd = st[:, _RD]
        thr = st[:, _THR]

        # --- One guided bounce (mirrors trace_wave_guided's body) ---
        hit = intersect(scene, ro, rd)
        it = surface_interaction(scene, ro, rd, hit)

        if has_medium:
            # Volumetric transport (mirrors trace_wave_guided
            # has_medium): free-flight distance sampling against the
            # surface hit; scattered lanes bounce via HG instead of the
            # BSDF and are never recorded (surface-only guiding, like
            # the reference, sdmm_proc.cpp:665-666,790-801).
            from . import medium as med

            k_med = jax.random.fold_in(k_g, 11)
            if has_hetero:
                ms = med.sample_distance_hetero(
                    scene, med_id, k_med, ro, rd, hit["t"])
            else:
                u_m = jax.random.uniform(k_med, (n_lanes,))
                ms = med.sample_distance(scene, med_id, u_m, hit["t"])
            scattered = alive & ms["scattered"]
            thr = thr * jnp.where(alive[:, None], ms["weight"], 1.0)
        else:
            scattered = jnp.zeros(n_lanes, dtype=bool)

        # in_img: vertices past max_depth exist only as training-radiance
        # targets (the scan's extra step); they never reach the image.
        in_img = depth0 < max_depth
        le = emitters.eval_emitter(scene, it, -rd)
        env = emitters.env_eval(scene, rd)
        le_eff0 = le + jnp.where(hit["valid"][:, None], 0.0, env)
        if has_medium:
            # A medium scatter happens BEFORE the surface: its emitter is
            # not reached this step (the free-flight sample subsumes the
            # transmittance, sdmm_proc.cpp:995-1053).
            le_eff0 = jnp.where(scattered[:, None], 0.0, le_eff0)
        li = st[:, _LI] + jnp.where(
            (alive & in_img)[:, None], thr * le_eff0, 0.0)
        if COLLECT:
            lt = st[:, _NCOLS:] + jnp.where(alive[:, None], thr * le_eff0,
                                            0.0)
        on_surface = alive & hit["valid"] & ~scattered
        # Each live step increments the path length (hit = surface vertex,
        # miss = terminal escape segment) — matches the reference's
        # rRec.depth accounting (avgPathLength, sdmm_proc.cpp:873-874).
        c["n_vert"] = c["n_vert"] + jnp.sum(alive & in_img).astype(
            jnp.float32)

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        wi_dot_geo = jnp.sum(it["ng"] * -rd, axis=-1)
        on_surface = on_surface & ~(wi_dot_geo * wi_local[..., 2] < 0.0)

        c_pos = canonical(gs, it["p"])
        leaf = stree.find_leaf(gs.tables, c_pos)
        delta_only = bsdf_mod.is_delta_only(params)

        u_sel = jax.random.uniform(k_sel, (n_lanes,))
        u1 = jax.random.uniform(k_b1, (n_lanes,))
        u2 = jax.random.uniform(k_b2, (n_lanes, 2))
        u0 = jax.random.uniform(jax.random.fold_in(k_b1, 7), (n_lanes,))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        wo_bsdf_world = to_world(s_ax, t_ax, n_ax, bs["wo"])

        if use_kernel:
            # Fused Pallas conditioning + sample + pdf: the only [N, K]
            # work left in XLA is the packed-row gather and a transpose.
            rows = gs.kernel_table[leaf]  # [N, C] row gather
            ug = jax.random.uniform(k_g, (3, n_lanes))
            d_g_t, g_ok, pdf_g, pdf_b, guide_valid = gp.guided_sample(
                rows.T, c_pos.T, wo_bsdf_world.T, ug
            )
            d_guide = d_g_t.T
            guide_ok = guide_valid & ~delta_only
            use_guide = guide_valid  # kernel folds initialized into valid
            cond_ok_mask = guide_valid
            use_product = jnp.zeros(n_lanes, dtype=bool)
            take_bsdf = (u_sel < jnp.where(guide_ok, bsdf_fraction, 1.0)) \
                | ~guide_ok
            gmm_pdf = jnp.where(
                guide_ok, jnp.where(take_bsdf, pdf_b, pdf_g), 0.0
            )
        else:
            weight_g, prep_g, use_guide = _lookup_conditioning(gs, leaf)
            cond = mix.create_conditional(prep_g, weight_g, c_pos)
            guide_ok = use_guide & cond.valid & ~delta_only
            cond_ok_mask = cond.valid

            if gs.learned is not None:
                from ..guiding.learned_bsdf import to_world_conditional

                from ..guiding.learned_bsdf import PRODUCT_TOP_K

                learned_cond, has_dmm = to_world_conditional(
                    gs.learned, it["bsdf"], s_ax, t_ax, n_ax, wi_local
                )
                # Top-k pruned conditional (reference:
                # create_conditional_pruned with top_k=2): products are
                # K_guide x 2, not K_guide x K_bsdf.
                prod = mix.product(
                    cond, mix.prune_conditional(learned_cond, PRODUCT_TOP_K)
                )
                use_product = guide_ok & has_dmm & prod.valid
            else:
                use_product = jnp.zeros(n_lanes, dtype=bool)
                prod = None

            h0 = jnp.where(guide_ok, bsdf_fraction, 1.0)
            h0 = jnp.where(use_product, 0.3, h0)
            take_bsdf = (u_sel < h0) | ~guide_ok

            d_guide, g_ok = mix.conditional_sample(cond, k_g)
            if prod is not None:
                d_prod, p_ok = mix.conditional_sample(
                    prod, jax.random.fold_in(k_g, 1))
                d_guide = jnp.where(use_product[..., None], d_prod, d_guide)
                g_ok = jnp.where(use_product, p_ok, g_ok)

        cond_try = on_surface & in_img & use_guide & ~delta_only
        c["n_cond_try"] = c["n_cond_try"] + jnp.sum(
            cond_try.astype(jnp.float32))
        c["n_cond_ok"] = c["n_cond_ok"] + jnp.sum(
            (cond_try & cond_ok_mask).astype(jnp.float32))

        h = jnp.where(guide_ok, bsdf_fraction, 1.0)
        h = jnp.where(use_product, 0.3, h)

        wo_guide_local = to_local(s_ax, t_ax, n_ax, d_guide)
        wo_local = jnp.where(take_bsdf[..., None], bs["wo"], wo_guide_local)
        wo_world = jnp.where(
            take_bsdf[..., None], wo_bsdf_world, d_guide
        )
        sampled_delta = take_bsdf & bs["delta"]

        f_eval, bsdf_pdf_eval = bsdf_mod.eval_pdf_full(
            params, wi_local, wo_local, types=bsdf_types
        )
        if not use_kernel:
            gmm_pdf = jnp.where(
                guide_ok, mix.conditional_pdf(cond, wo_world), 0.0)
            if prod is not None:
                prod_pdf = mix.conditional_pdf(prod, wo_world)
                gmm_pdf = jnp.where(use_product, prod_pdf, gmm_pdf)
        mis_pdf = h * bsdf_pdf_eval + (1.0 - h) * gmm_pdf

        w_smooth = f_eval / jnp.maximum(mis_pdf, 1e-20)[..., None]
        w_delta = bs["weight"] / jnp.maximum(h, 1e-6)[..., None]
        bweight = jnp.where(sampled_delta[..., None], w_delta, w_smooth)
        ok_sample = jnp.where(
            sampled_delta,
            jnp.any(bs["weight"] > 0.0, axis=-1),
            (mis_pdf > 0.0)
            & jnp.any(f_eval > 0.0, axis=-1)
            & (take_bsdf | g_ok),
        )
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ok_sample = ok_sample & ~(wo_dot_geo * wo_local[..., 2] <= 0.0)

        depth = depth0 + 1
        surf_cont = on_surface & ok_sample
        survive = (surf_cont | scattered) & (depth < max_depth + extra)
        thr_next = thr * jnp.where((surf_cont & survive)[:, None], bweight,
                                   1.0)
        eta_sq = st[:, _ETA2] * jnp.where(
            surf_cont & survive, bs["eta"] * bs["eta"], 1.0)

        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(thr_next, axis=-1) * eta_sq, 0.95)
        )
        do_rr = depth + 1 >= rr_depth
        u_rr = jax.random.uniform(k_rr, (n_lanes,))
        survive = survive & ~(do_rr & (u_rr >= q))
        thr_next = jnp.where(
            (do_rr & survive)[:, None],
            thr_next / jnp.maximum(q, 1e-6)[:, None], thr_next,
        )

        # --- Terminate finished paths: fused film scatter ---
        done = alive & ~survive
        li_s = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
        val = jnp.where(done[:, None], li_s, 0.0)
        row = jnp.concatenate(
            [val, val * val,
             done.astype(jnp.float32)[:, None],
             jnp.zeros((n_lanes, 1))], axis=-1,
        )
        if COLLECT:
            # Emit this vertex's training record NOW; incident radiance is
            # reconstructed post-loop from the path-radiance buffer. The
            # recorded throughput is post-RR thr_next: the factor that
            # multiplies every later emitter hit (telescoping identity).
            # (Measured: one combined 3N-row scatter into a merged buffer
            # is SLOWER than these three separate calls — scatter cost
            # scales with index rows, not calls, at this size.)
            rec = on_surface & ok_sample & ~sampled_delta & in_img
            clamped_pdf = jnp.maximum(mis_pdf, PDF_CLAMP)
            rrank = jnp.cumsum(rec.astype(jnp.int32)) - 1
            sidx = c["samp_cursor"] + rrank
            ok_emit = rec & (sidx < collect_cap)
            srow = jnp.concatenate([
                c_pos, wo_world, clamped_pdf[:, None], thr_next, lt,
                c["path_id"].astype(jnp.float32)[:, None],
                c["seq"].astype(jnp.float32)[:, None],
                jnp.zeros((n_lanes, 1)),
            ], axis=-1)
            c["samp"] = c["samp"].at[
                jnp.where(ok_emit, sidx, collect_cap)
            ].set(srow, mode="drop")
            c["samp_cursor"] = c["samp_cursor"] + jnp.sum(
                rec.astype(jnp.int32))
            c["seq"] = jnp.where(rec, c["seq"] + 1, c["seq"])
            lt_s = jnp.nan_to_num(lt, nan=0.0, posinf=0.0, neginf=0.0)
            c["path_rad"] = c["path_rad"].at[
                jnp.where(done, c["path_id"], total)
            ].set(lt_s, mode="drop")
        c["film"] = c["film"].at[pix].add(row)

        ro_next = it["p"] + it["ng"] * jnp.where(
            wo_dot_geo > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        wo_out = wo_world
        if has_medium:
            # HG phase scattering at medium events (perfectly importance-
            # sampled: direction weight 1, albedo in ms.weight) + medium
            # switches at crossed boundaries.
            g_ray = scene.med_g[med_id]
            p_med = ro + ms["t"][:, None] * rd
            u_ph = jax.random.uniform(jax.random.fold_in(k_g, 3),
                                      (n_lanes, 2))
            d_med, _ = med.hg_sample(g_ray, rd, u_ph)
            med_id = med.update_medium(
                scene, med_id, hit["tri"], wi_dot_geo, wo_dot_geo,
                surf_cont & survive,
            )
            ro_next = jnp.where(scattered[:, None], p_med, ro_next)
            wo_out = jnp.where(scattered[:, None], d_med, wo_world)
        c["state"] = jnp.concatenate(
            [ro_next, wo_out, thr_next, li, eta_sq[:, None]]
            + ([lt] if COLLECT else []), axis=-1
        )
        depth_packed = jnp.where(survive, depth, 0) & _DEPTH_MASK
        c["meta"] = (
            pix
            | (depth_packed << _DEPTH_SHIFT)
            | jnp.where(survive, _ALIVE, 0)
            | jnp.where(exhausted, _EXH, 0)
            | ((med_id & _MED_MASK) << _MED_SHIFT if has_medium else 0)
        )
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((n_pix, 8)),
        "cursor": jnp.int32(0),
        "state": jnp.zeros((n_lanes, _NCOLS + (3 if COLLECT else 0)))
        .at[:, 5].set(1.0)
        .at[:, _THR].set(1.0)
        .at[:, _ETA2].set(1.0),
        "meta": jnp.zeros((n_lanes,), jnp.int32),
        "n_vert": jnp.float32(0.0),
        "n_cond_try": jnp.float32(0.0),
        "n_cond_ok": jnp.float32(0.0),
    }
    if COLLECT:
        init.update({
            "path_id": jnp.zeros((n_lanes,), jnp.int32),
            "seq": jnp.zeros((n_lanes,), jnp.int32),
            "samp": jnp.zeros((collect_cap, 16)),
            "samp_cursor": jnp.int32(0),
            "path_rad": jnp.zeros((total, 3)),
        })
    out = jax.lax.while_loop(cond_fn, body, init)
    res = {
        "image": out["film"][:, 0:3],
        "sqr": out["film"][:, 3:6],
        "weight": out["film"][:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
        "n_cond_try": out["n_cond_try"],
        "n_cond_ok": out["n_cond_ok"],
    }
    if COLLECT:
        res["_collect_raw"] = (out["samp"], out["path_rad"],
                               out["samp_cursor"])
    return res


@partial(jax.jit, static_argnames=("S",))
def _finalize_collect(samp, path_rad, cursor, n_cond_try, n_cond_ok,
                      n_vert, S):
    """Reconstruct per-vertex training weights from the emitted records +
    per-path final radiance (see render_pool_guided docstring). Output
    layout matches trace_wave_guided's samples dict."""
    cap = samp.shape[0]
    total = path_rad.shape[0]
    filled = jnp.arange(cap) < jnp.minimum(cursor, cap)
    pos = samp[:, 0:3]
    dirs = samp[:, 3:6]
    pdf = samp[:, 6]
    thr = samp[:, 7:10]
    lsnap = samp[:, 10:13]
    pid = samp[:, 13].astype(jnp.int32)
    seq = samp[:, 14]

    rad = path_rad[pid]
    diff = rad - lsnap
    # Channels with exactly-zero throughput carry no later contribution
    # (diff is 0 there too up to fp noise): incident 0, like the scan.
    inc = jnp.where(thr > 0.0, diff / jnp.where(thr > 0.0, thr, 1.0), 0.0)
    w = jnp.mean(inc, axis=-1) / jnp.maximum(pdf, PDF_CLAMP)

    # Last-S-of-path cap (reference: firstSaved = max(depth − S, 0),
    # sdmm_proc.cpp:916-918 — over recorded vertices, not valid ones).
    seq_max = jnp.full((total,), -1.0).at[
        jnp.where(filled, pid, total)
    ].max(jnp.where(filled, seq, -1.0), mode="drop")
    smax = seq_max[pid]
    keep = filled & (seq >= smax + 1.0 - S)
    valid = keep & jnp.isfinite(w) & (w >= 0.0)
    # Terminal = last VALID vertex of its path (gets the jitter replica,
    # reference sdmm_proc.cpp:932).
    vseq_max = jnp.full((total,), -1.0).at[
        jnp.where(valid, pid, total)
    ].max(jnp.where(valid, seq, -1.0), mode="drop")
    terminal = valid & (seq == vseq_max[pid])

    safe_pos = jnp.where(valid[:, None], pos, 0.5)
    safe_dir = jnp.where(valid[:, None], dirs, jnp.array([0.0, 0.0, 1.0]))
    return {
        "n_cond_try": n_cond_try,
        "n_cond_ok": n_cond_ok,
        "n_vertices": n_vert,
        "pos": jnp.nan_to_num(safe_pos, nan=0.5, posinf=0.5, neginf=0.5),
        "dir": safe_dir,
        "weight": jnp.where(valid, w, -1.0),
        "valid": valid,
        "terminal": terminal,
    }


def guided_fused_supported(scene, cfg, gs: GuideState) -> bool:
    """Host-side gate for the split guided megakernel
    (ops/guided_step_pallas): same scene class as the unguided fused
    engine minus NEE-specific limits — in-kernel BSDF types, no textures,
    constant env only, no media/sss, triangle table within MAX_TRIS."""
    import os

    from ..ops import bounce_pallas as bp

    return bool(
        os.environ.get("SDMM_TPU_NO_FUSED") != "1"
        and gs.kernel_table is not None
        and gs.learned is None
        and len(cfg.bsdf_types) > 0
        and all(t in bp.SUPPORTED_TYPES for t in cfg.bsdf_types)
        and not cfg.has_bump
        and not cfg.has_medium
        and not cfg.has_sss
        and scene.tri_v0.shape[0] <= bp.MAX_TRIS
        and scene.env_pdf.shape[0] <= 1
        and scene.pt_pos.shape[0] == 0
        and scene.textures.shape[1] <= 1
        and cfg.width * cfg.height <= _PIX_MASK
    )


@partial(jax.jit, static_argnames=(
    "n_lanes", "spp", "width", "height", "max_depth", "rr_depth",
    "bsdf_fraction", "bsdf_types", "fov_axis", "interpret",
))
def render_pool_guided_fused(
    scene,
    gs: GuideState,
    key,
    n_lanes: int,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    bsdf_fraction: float = 0.5,
    bsdf_types: tuple = (0,),
    fov_axis: str = "x",
    interpret: bool = False,
):
    """Guided pool on the split megakernel: trace kernel -> XLA leaf/row
    fetch -> shade kernel (ops/guided_step_pallas). Estimator-identical
    to render_pool_guided; callers must pass guided_fused_supported
    scenes. Returns the same dict as render_pool_guided."""
    from ..ops import bounce_pallas as bp
    from ..ops import guided_step_pallas as gsp
    from ..scene.sensor import generate_rays

    n_pix = width * height
    assert n_pix <= _PIX_MASK
    assert max_depth <= _DEPTH_MASK + 1
    assert n_lanes % (gsp.RT * 128) == 0, n_lanes
    total = n_pix * spp
    r_rows = n_lanes // 128
    tri_rows, _, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    # bf16 halves the dominant glue traffic (449-float row gather +
    # transpose); consistency is preserved — the pdf in the MIS weight is
    # computed from the SAME rounded rows the sample was drawn from, so
    # the estimator stays unbiased (only guide quality rounds).
    kt16 = gs.kernel_table.astype(jnp.bfloat16)

    def cond_fn(c):
        meta = c["meta"]
        return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

    INNER = 4  # bounces per film scatter: the XLA scatter has ~2 ms FLAT
    # per-call cost (measured: 16k rows costs the same as 131k), so k
    # bounces batch their splats into ONE k*N-row scatter call.

    def body(c):
        st = c["state"]  # [16, N]
        meta = c["meta"]  # [N]
        pix_list = []
        row_list = []
        for j in range(INNER):
            k = jax.random.fold_in(key, c["step"] * INNER + j)
            k_regen, k_rand = jax.random.split(k, 2)
            alive = (meta & _ALIVE) != 0
            exhausted = (meta & _EXH) != 0
            pix = meta & _PIX_MASK

            # --- Regenerate dead lanes (global counter) ---
            need = ~alive & ~exhausted
            rank = jnp.cumsum(need.astype(jnp.int32)) - 1
            g = c["cursor"] + rank
            in_budget = need & (g < total)
            pix_n = jnp.where(in_budget, g % n_pix, 0)
            u = jax.random.uniform(k_regen, (n_lanes, 2))
            px = (pix_n % width).astype(jnp.float32) + u[:, 0]
            py = (pix_n // width).astype(jnp.float32) + u[:, 1]
            ro_n, rd_n = generate_rays(
                scene, jnp.stack([px, py], axis=-1), width, height, fov_axis
            )
            start = in_budget
            exhausted = exhausted | (need & ~in_budget)
            c["cursor"] = c["cursor"] + jnp.sum(start.astype(jnp.int32))
            pix = jnp.where(start, pix_n, pix)
            fresh = jnp.concatenate([
                ro_n.T, rd_n.T, jnp.ones((3, n_lanes)),
                jnp.zeros((3, n_lanes)),
                jnp.ones((1, n_lanes)), jnp.zeros((3, n_lanes)),
            ], axis=0)
            st = jnp.where(start[None, :], fresh, st)
            meta = (
                pix
                | jnp.where(alive | start, _ALIVE, 0)
                | jnp.where(exhausted, _EXH, 0)
                | jnp.where(start, 0, meta & (_DEPTH_MASK << _DEPTH_SHIFT))
            )

            # --- Kernel A: trace + emitter accumulate ---
            st3 = st.reshape(16, r_rows, 128)
            meta3 = meta.reshape(r_rows, 128)
            st3, hit = gsp.trace(
                st3, meta3, tri_rows, env_row, n_tris=n_tris,
                types=bsdf_types, interpret=interpret,
            )

            # --- XLA glue: leaf find + packed-row fetch ---
            hit_f = hit.reshape(gsp.HIT_ROWS, n_lanes)
            p = hit_f[0:3].T
            c_pos = canonical(gs, p)
            leaf = stree.find_leaf(gs.tables, c_pos)
            rows_t = kt16[leaf].T  # [C, N] bf16

            rand = jax.random.uniform(k_rand, (gsp.RAND_ROWS, r_rows, 128))

            # --- Kernel B: guided + BSDF shade ---
            st3, meta3, splat = gsp.shade(
                st3, meta3, hit,
                c_pos.T.reshape(3, r_rows, 128),
                rows_t.reshape(gsp.N_ROWS, r_rows, 128),
                rand, types=bsdf_types, max_depth=max_depth,
                rr_depth=rr_depth, bsdf_fraction=bsdf_fraction,
                interpret=interpret,
            )
            st = st3.reshape(16, n_lanes)
            meta = meta3.reshape(n_lanes)

            sp = splat.reshape(gsp.SPLAT_ROWS, n_lanes)
            c["n_vert"] = c["n_vert"] + jnp.sum(sp[7])
            c["n_cond_try"] = c["n_cond_try"] + jnp.sum(sp[8])
            c["n_cond_ok"] = c["n_cond_ok"] + jnp.sum(sp[9])
            pix_list.append(pix)
            row_list.append(
                jnp.concatenate([sp[0:7].T, jnp.zeros((n_lanes, 1))],
                                axis=-1))
        c["state"] = st
        c["meta"] = meta
        c["film"] = c["film"].at[jnp.concatenate(pix_list)].add(
            jnp.concatenate(row_list))
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((n_pix, 8)),
        "cursor": jnp.int32(0),
        "state": jnp.zeros((16, n_lanes))
        .at[5].set(1.0)
        .at[6:9].set(1.0)
        .at[12].set(1.0),
        "meta": jnp.zeros((n_lanes,), jnp.int32),
        "n_vert": jnp.float32(0.0),
        "n_cond_try": jnp.float32(0.0),
        "n_cond_ok": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond_fn, body, init)
    return {
        "image": out["film"][:, 0:3],
        "sqr": out["film"][:, 3:6],
        "weight": out["film"][:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
        "n_cond_try": out["n_cond_try"],
        "n_cond_ok": out["n_cond_ok"],
    }


@partial(jax.jit, static_argnames=(
    "spp", "spp_pilot", "width", "height", "max_depth", "rr_depth",
    "bsdf_fraction", "bsdf_types", "fov_axis", "interpret",
))
def render_pool_guided_sorted2(
    scene,
    gs: GuideState,
    key,
    spp: int,
    width: int,
    height: int,
    spp_pilot: int = 8,
    max_depth: int = 10,
    rr_depth: int = 10,
    bsdf_fraction: float = 0.5,
    bsdf_types: tuple = (0,),
    fov_axis: str = "x",
    interpret: bool = False,
):
    """Cost-sorted pixel-stationary guided pool (the unguided sorted2
    schedule, wavefront.render_pool_fused_sorted2, applied to the split
    trace/shade guided kernels):

    - pilot phase: every lane owns its own pixel for ``spp_pilot`` spp
      and counts its ACTUAL path vertices (splat row 7);
    - main phase: pixels are argsorted by measured cost, so each lane
      tile holds equal-cost pixels and drains as a unit; dead tiles skip
      both kernels via tile_alive flags (in-kernel passthrough);
    - film is a DENSE per-lane [N, 7] accumulation (lane == pixel slot),
      scattered into the pixel film once per phase — the per-step XLA
      film scatter (~2 ms at 131k lanes, PERF.md r4) disappears.

    Estimator-identical to render_pool_guided (same one-sample MIS).
    """
    from ..ops import bounce_pallas as bp
    from ..ops import guided_step_pallas as gsp
    from ..scene.sensor import generate_rays

    n_pix = width * height
    assert 0 < spp_pilot < spp and n_pix <= _PIX_MASK
    n_tris = scene.tri_v0.shape[0]
    r_rows0 = -(-n_pix // 128)
    rt_tr = gsp.trace_rt(-(-r_rows0 // gsp.RT) * gsp.RT, n_tris)
    tile = max(rt_tr, gsp.RT) * 128
    n_lanes = -(-n_pix // tile) * tile
    r_rows = n_lanes // 128
    n_tiles_tr = r_rows // rt_tr
    n_tiles_sh = r_rows // gsp.RT
    assert max_depth <= _DEPTH_MASK + 1
    tri_rows, _, env_row = bp.build_tables(scene)
    kt16 = gs.kernel_table.astype(jnp.bfloat16)  # see render_pool_guided_fused
    lane = jnp.arange(n_lanes, dtype=jnp.int32)

    def run_phase(pix_of_lane, budget, k_phase):
        px_base = (pix_of_lane % width).astype(jnp.float32)
        py_base = (pix_of_lane // width).astype(jnp.float32)

        def cond_fn(c):
            meta = c["meta"]
            return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

        def body(c):
            k = jax.random.fold_in(k_phase, c["step"])
            k_regen, k_rand = jax.random.split(k, 2)
            st = c["state"]
            meta = c["meta"]
            alive = (meta & _ALIVE) != 0
            exhausted = (meta & _EXH) != 0
            count = meta & _PIX_MASK

            need = ~alive & ~exhausted
            start = need & (count < budget)
            exhausted = exhausted | (need & ~start)
            u = jax.random.uniform(k_regen, (n_lanes, 2))
            ro_n, rd_n = generate_rays(
                scene,
                jnp.stack([px_base + u[:, 0], py_base + u[:, 1]], axis=-1),
                width, height, fov_axis,
            )
            count = jnp.where(start, count + 1, count)
            fresh = jnp.concatenate([
                ro_n.T, rd_n.T, jnp.ones((3, n_lanes)),
                jnp.zeros((3, n_lanes)),
                jnp.ones((1, n_lanes)), jnp.zeros((3, n_lanes)),
            ], axis=0)
            st = jnp.where(start[None, :], fresh, st)
            meta = (
                count
                | jnp.where(alive | start, _ALIVE, 0)
                | jnp.where(exhausted, _EXH, 0)
                | jnp.where(start, 0, meta & (_DEPTH_MASK << _DEPTH_SHIFT))
            )
            runnable = ((meta & _ALIVE) != 0)
            alive_tr = jnp.any(
                runnable.reshape(n_tiles_tr, rt_tr * 128), axis=1
            ).astype(jnp.int32)
            alive_sh = jnp.any(
                runnable.reshape(n_tiles_sh, gsp.RT * 128), axis=1
            ).astype(jnp.int32)

            st3 = st.reshape(16, r_rows, 128)
            meta3 = meta.reshape(r_rows, 128)
            st3, hit = gsp.trace(
                st3, meta3, tri_rows, env_row, n_tris=n_tris,
                types=bsdf_types, interpret=interpret,
                tile_alive=alive_tr,
            )

            hit_f = hit.reshape(gsp.HIT_ROWS, n_lanes)
            p = hit_f[0:3].T
            c_pos = canonical(gs, p)
            leaf = stree.find_leaf(gs.tables, c_pos)
            rows_t = kt16[leaf].T  # [C, N] bf16

            rand = jax.random.uniform(k_rand, (gsp.RAND_ROWS, r_rows, 128))
            st3, meta3, splat = gsp.shade(
                st3, meta3, hit,
                c_pos.T.reshape(3, r_rows, 128),
                rows_t.reshape(gsp.N_ROWS, r_rows, 128),
                rand, types=bsdf_types, max_depth=max_depth,
                rr_depth=rr_depth, bsdf_fraction=bsdf_fraction,
                interpret=interpret, tile_alive=alive_sh,
            )
            c["state"] = st3.reshape(16, n_lanes)
            c["meta"] = meta3.reshape(n_lanes)
            sp = splat.reshape(gsp.SPLAT_ROWS, n_lanes)
            c["film"] = c["film"] + sp[0:gsp.SPLAT_ROWS].T
            c["step"] = c["step"] + 1
            return c

        init = {
            "step": jnp.int32(0),
            "film": jnp.zeros((n_lanes, gsp.SPLAT_ROWS)),
            "state": jnp.zeros((16, n_lanes))
            .at[5].set(1.0)
            .at[6:9].set(1.0)
            .at[12].set(1.0),
            "meta": jnp.where(
                budget > 0, jnp.int32(0), jnp.int32(_EXH)
            ),
            "n_vert": jnp.float32(0.0),
        }
        out = jax.lax.while_loop(cond_fn, body, init)
        return out["film"], out["step"]

    in_image = lane < n_pix
    pix_a = jnp.where(in_image, lane, 0)
    film_a, steps_a = run_phase(
        pix_a, jnp.where(in_image, spp_pilot, 0), key)

    cost = jnp.where(in_image, film_a[:, 7], -1.0)
    order = jnp.argsort(cost).astype(jnp.int32)
    valid_b = cost[order] >= 0.0
    film_b, steps_b = run_phase(
        jnp.where(valid_b, order, 0),
        jnp.where(valid_b, spp - spp_pilot, 0),
        jax.random.fold_in(key, 1),
    )

    film = (
        jnp.zeros((n_pix + 1, gsp.SPLAT_ROWS))
        .at[jnp.where(in_image, pix_a, n_pix)].add(film_a)
        .at[jnp.where(valid_b, order, n_pix)].add(film_b)
    )[:n_pix]
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": jnp.sum(film[:, 7]),
        "steps": steps_a + steps_b,
        "n_cond_try": jnp.sum(film[:, 8]),
        "n_cond_ok": jnp.sum(film[:, 9]),
    }


@partial(jax.jit, static_argnames=(
    "spp", "width", "height", "max_depth", "rr_depth",
    "bsdf_fraction", "bsdf_types", "fov_axis", "interpret",
))
def render_pool_guided_striped(
    scene,
    gs: GuideState,
    key,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    bsdf_fraction: float = 0.5,
    bsdf_types: tuple = (0,),
    fov_axis: str = "x",
    interpret: bool = False,
):
    """Pixel-stationary guided pool on the split megakernel.

    Same trace/shade kernels as render_pool_guided_fused, but lane i owns
    pixel i with a static spp budget, so the film update is a DENSE
    per-lane add and regeneration needs no cumsum/global counter — the
    XLA film scatter cost ~1.8 ms/step (35%) in the compacting variant
    (same finding as the unguided striped pool, wavefront.py:1106)."""
    from ..ops import bounce_pallas as bp
    from ..ops import guided_step_pallas as gsp
    from ..scene.sensor import generate_rays

    n_pix = width * height
    tile = gsp.RT_TRACE * 128
    n_lanes = ((n_pix + tile - 1) // tile) * tile
    assert max_depth <= _DEPTH_MASK + 1
    r_rows = n_lanes // 128
    tri_rows, _, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    kt16 = gs.kernel_table.astype(jnp.bfloat16)  # see render_pool_guided_fused
    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    in_image = lane < n_pix
    px_base = (lane % width).astype(jnp.float32)
    py_base = (lane // width).astype(jnp.float32)

    # meta reuses the pix field (bits 0..19) as the per-lane sample count.
    def cond_fn(c):
        meta = c["meta"]
        return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

    def body(c):
        k = jax.random.fold_in(key, c["step"])
        k_regen, k_rand = jax.random.split(k, 2)

        st = c["state"]  # [16, N]
        meta = c["meta"]
        alive = (meta & _ALIVE) != 0
        exhausted = (meta & _EXH) != 0
        count = meta & _PIX_MASK

        # --- Regenerate dead lanes on their own pixel (dense) ---
        need = ~alive & ~exhausted
        start = need & (count < spp) & in_image
        exhausted = exhausted | (need & ~start)
        u = jax.random.uniform(k_regen, (n_lanes, 2))
        ro_n, rd_n = generate_rays(
            scene,
            jnp.stack([px_base + u[:, 0], py_base + u[:, 1]], axis=-1),
            width, height, fov_axis,
        )
        count = jnp.where(start, count + 1, count)
        fresh = jnp.concatenate([
            ro_n.T, rd_n.T, jnp.ones((3, n_lanes)), jnp.zeros((3, n_lanes)),
            jnp.ones((1, n_lanes)), jnp.zeros((3, n_lanes)),
        ], axis=0)
        st = jnp.where(start[None, :], fresh, st)
        meta = (
            count
            | jnp.where(alive | start, _ALIVE, 0)
            | jnp.where(exhausted, _EXH, 0)
            | jnp.where(start, 0, meta & (_DEPTH_MASK << _DEPTH_SHIFT))
        )

        st3 = st.reshape(16, r_rows, 128)
        meta3 = meta.reshape(r_rows, 128)
        st3, hit = gsp.trace(
            st3, meta3, tri_rows, env_row, n_tris=n_tris,
            types=bsdf_types, interpret=interpret,
        )

        hit_f = hit.reshape(gsp.HIT_ROWS, n_lanes)
        p = hit_f[0:3].T
        c_pos = canonical(gs, p)
        leaf = stree.find_leaf(gs.tables, c_pos)
        rows_t = kt16[leaf].T  # [C, N] bf16

        rand = jax.random.uniform(k_rand, (gsp.RAND_ROWS, r_rows, 128))
        st3, meta3, splat = gsp.shade(
            st3, meta3, hit,
            c_pos.T.reshape(3, r_rows, 128),
            rows_t.reshape(gsp.N_ROWS, r_rows, 128),
            rand, types=bsdf_types, max_depth=max_depth,
            rr_depth=rr_depth, bsdf_fraction=bsdf_fraction,
            interpret=interpret,
        )
        c["state"] = st3.reshape(16, n_lanes)
        c["meta"] = meta3.reshape(n_lanes)

        sp = splat.reshape(gsp.SPLAT_ROWS, n_lanes)
        c["n_vert"] = c["n_vert"] + jnp.sum(sp[7])
        c["n_cond_try"] = c["n_cond_try"] + jnp.sum(sp[8])
        c["n_cond_ok"] = c["n_cond_ok"] + jnp.sum(sp[9])
        # Dense per-lane accumulation — lane == pixel, no scatter.
        c["film"] = c["film"] + sp[0:7].T
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((n_lanes, 7)),
        "state": jnp.zeros((16, n_lanes))
        .at[5].set(1.0)
        .at[6:9].set(1.0)
        .at[12].set(1.0),
        "meta": jnp.zeros((n_lanes,), jnp.int32),
        "n_vert": jnp.float32(0.0),
        "n_cond_try": jnp.float32(0.0),
        "n_cond_ok": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond_fn, body, init)
    film = out["film"][:n_pix]
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
        "n_cond_try": out["n_cond_try"],
        "n_cond_ok": out["n_cond_ok"],
    }
