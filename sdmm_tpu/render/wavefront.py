"""Persistent wavefront renderer with path regeneration.

Performance redesign of the plain wave driver (renderer.py + volpath.py):
instead of tracing fixed ray batches to completion — where lane occupancy
decays with the survival curve (mean path length 3.5 of max_depth 10 means
>60% of lanes idle in late bounces, PERF.md) — every lane owns a *stream*
of camera samples. When a lane's path terminates it splats its radiance to
the film and immediately restarts on its next camera sample, keeping the
whole wave ~100% occupied until the sample budget drains.

This replaces the reference's work-unit/tile decomposition
(reference: mitsuba/include/mitsuba/render/renderproc.h BlockedRenderProcess)
at the lane level: a global counter hands each dying lane the next
unconsumed camera sample (per-step prefix sum — the TPU analog of a
work-stealing queue). One `lax.while_loop` iteration = one bounce for all
lanes.

Carry layout: the whole per-lane state lives in ONE [n_lanes, 16] f32
matrix plus ONE bit-packed i32 vector (pixel | depth | flags). With ~15
separate carry arrays, XLA's memory-space assignment issued thousands of
tiny pred/f32 copy-start DMAs per run (50%+ of device time in the XPlane
profile); two wide buffers collapse that churn.

Media are not yet supported here; callers fall back to the classic wave
driver for scenes with media.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..core.frame import to_local, to_world
from ..scene import emitters
from ..scene.sensor import generate_rays
from . import intersect as isect
from .volpath import RAY_EPS, mi_weight, shading_frame

# f32 state columns.
_RO = slice(0, 3)
_RD = slice(3, 6)
_THR = slice(6, 9)
_LI = slice(9, 12)
_ETA2 = 12
_PPDF = 13
_NCOLS = 14

# i32 meta bit layout: pix (bits 0..19), depth (20..23),
# alive (24), exhausted (25), prev_delta (26).
_DEPTH_SHIFT = 20
_ALIVE = 1 << 24
_EXH = 1 << 25
_PDELTA = 1 << 26
_PIX_MASK = (1 << 20) - 1
_DEPTH_MASK = 0xF


@partial(jax.jit, static_argnames=(
    "n_lanes", "spp", "width", "height", "max_depth", "rr_depth", "nee",
    "bsdf_types", "fov_axis", "has_bump",
))
def render_pool(
    scene,
    key,
    n_lanes: int,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    nee: bool = True,
    bsdf_types: tuple | None = None,
    fov_axis: str = "x",
    has_bump: bool = False,
):
    """Render width×height at spp with a regenerating lane pool.

    Returns dict(image, sqr, weight [flat n_pix, …], n_vertices []).
    """
    n_pix = width * height
    assert n_pix <= _PIX_MASK, "pixel index exceeds the packed 20-bit field"
    assert max_depth <= _DEPTH_MASK + 1
    total = n_pix * spp
    pdf_over_area = emitters.tri_pdf_over_area(scene)
    has_env_nee = nee and scene.env_pdf.shape[0] > 1

    def cond(c):
        meta = c["meta"]
        return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

    def body(c):
        k = jax.random.fold_in(key, c["step"])
        k_regen, k_nee, k_b0, k_b1, k_b2, k_rr = jax.random.split(k, 6)

        st = c["state"]
        meta = c["meta"]
        alive = (meta & _ALIVE) != 0
        exhausted = (meta & _EXH) != 0
        prev_delta = (meta & _PDELTA) != 0
        pix = meta & _PIX_MASK
        depth0 = (meta >> _DEPTH_SHIFT) & _DEPTH_MASK

        # --- Regenerate dead lanes on their next camera sample ---
        need = ~alive & ~exhausted
        # Dynamic work assignment: a global counter hands the next
        # unconsumed sample index to each dying lane (rank = prefix sum of
        # the regenerating mask). Per-lane static budgets would leave a
        # straggler tail — the loop runs until the slowest lane drains, and
        # the max over lanes of 'sum of path lengths' is far above the
        # mean. With the shared counter the tail is one path length.
        rank = jnp.cumsum(need.astype(jnp.int32)) - 1
        g = c["cursor"] + rank  # cursor doubles as the global counter
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
            ro_n, rd_n, jnp.ones((n_lanes, 3)), jnp.zeros((n_lanes, 3)),
            jnp.ones((n_lanes, 2)),
        ], axis=-1)
        st = jnp.where(start[:, None], fresh, st)
        prev_delta = jnp.where(start, True, prev_delta)
        depth0 = jnp.where(start, 0, depth0)
        alive = alive | start

        ro = st[:, _RO]
        rd = st[:, _RD]
        thr = st[:, _THR]

        # --- One bounce (mirrors volpath.trace_wave's body) ---
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        if has_bump:
            it["ns"] = isect.apply_bumpmap(scene, it)

        le = emitters.eval_emitter(scene, it, -rd)
        if nee:
            pdf_nee = emitters.pdf_direct_hit(
                scene, pdf_over_area, hit["tri"], rd, hit["t"]
            )
            w_hit = jnp.where(prev_delta, 1.0, mi_weight(st[:, _PPDF], pdf_nee))
        else:
            w_hit = jnp.ones(n_lanes)
        li = st[:, _LI] + jnp.where(alive[:, None], thr * le * w_hit[:, None], 0.0)

        if has_env_nee:
            pdf_env_nee = emitters.pdf_env_dir(scene, rd) * scene.env_select_prob
            w_env = jnp.where(
                prev_delta, 1.0, mi_weight(st[:, _PPDF], pdf_env_nee)
            )
        else:
            w_env = jnp.ones(n_lanes)
        escaped = alive & ~hit["valid"]
        li = li + jnp.where(
            escaped[:, None],
            thr * emitters.env_eval(scene, rd) * w_env[:, None], 0.0,
        )

        on_surface = alive & hit["valid"]
        c["n_vert"] = c["n_vert"] + jnp.sum(on_surface).astype(jnp.float32)

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        wi_dot_geo = jnp.sum(it["ng"] * -rd, axis=-1)
        from ..scene.scene import BSDF_NULL as _NULL

        cullable = params["type"] != _NULL
        if "is_mask" in params:
            cullable = cullable & ~params["is_mask"]
        on_surface = on_surface & ~(
            cullable & (wi_dot_geo * wi_local[..., 2] < 0.0)
        )

        if nee:
            u1n = jax.random.uniform(k_nee, (n_lanes,))
            u2n = jax.random.uniform(jax.random.fold_in(k_nee, 1), (n_lanes, 2))
            ls = emitters.sample_direct(scene, it["p"], u1n, u2n)
            wo_l = to_local(s_ax, t_ax, n_ax, ls["d"])
            f, pdf_b = bsdf_mod.eval_pdf_full(
                params, wi_local, wo_l, types=bsdf_types
            )
            smooth = bsdf_mod.has_smooth(params)
            # The NEE light vertex sits at path depth depth0+2; gate it by
            # maxDepth exactly like the reference (volpath.cpp breaks before
            # NEE once depth >= maxDepth), else NEE counts one segment more
            # than BSDF sampling and the estimators diverge at the cutoff.
            cand = (
                on_surface & ls["valid"] & smooth & (ls["pdf"] > 0.0)
                & (depth0 + 2 <= max_depth)
            )
            shadow_o = it["p"] + it["ng"] * jnp.where(
                jnp.sum(it["ng"] * ls["d"], axis=-1) > 0, RAY_EPS, -RAY_EPS
            )[:, None]
            occ = isect.occluded(scene, shadow_o, ls["d"], ls["dist"] * (1.0 - 1e-3))
            w = jnp.where(ls["delta"], 1.0, mi_weight(ls["pdf"], pdf_b))
            contrib = thr * f * ls["radiance"] * (
                w / jnp.maximum(ls["pdf"], 1e-20)
            )[:, None]
            li = li + jnp.where((cand & ~occ)[:, None], contrib, 0.0)

        u0 = jax.random.uniform(k_b0, (n_lanes,))
        u1 = jax.random.uniform(k_b1, (n_lanes,))
        u2 = jax.random.uniform(k_b2, (n_lanes, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        good = jnp.any(bs["weight"] > 0.0, axis=-1) & (
            bs["pass"] | ~(wo_dot_geo * bs["wo"][..., 2] <= 0.0)
        )

        depth = depth0 + 1
        survive = on_surface & good & (depth < max_depth)
        thr_next = thr * jnp.where(survive[:, None], bs["weight"], 1.0)
        eta_sq = st[:, _ETA2] * jnp.where(survive, bs["eta"] * bs["eta"], 1.0)

        # Russian roulette (reference: sdmm_proc.cpp:858).
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

        # --- Terminate finished paths: splat to film ---
        done = alive & ~survive
        li_s = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
        val = jnp.where(done[:, None], li_s, 0.0)
        # One fused scatter for (rgb, rgb², weight): three separate
        # .at[].add scatters cost ~37% of the whole step (XPlane profile);
        # packing the seven accumulators into one [n_pix, 8] row makes it
        # a single scatter at the same byte volume.
        row = jnp.concatenate(
            [val, val * val,
             done.astype(jnp.float32)[:, None],
             jnp.zeros((n_lanes, 1))], axis=-1,
        )
        c["film"] = c["film"].at[pix].add(row)

        offset_sign = jnp.where(wo_dot_geo > 0, RAY_EPS, -RAY_EPS)
        ro_next = it["p"] + it["ng"] * offset_sign[:, None]
        c["state"] = jnp.concatenate([
            ro_next, wo_world, thr_next, li,
            eta_sq[:, None], bs["pdf"][:, None],
        ], axis=-1)
        # Dead lanes would otherwise keep incrementing depth each idle step
        # and overflow the 4-bit field into the flag bits.
        depth_packed = jnp.where(survive, depth, 0) & _DEPTH_MASK
        c["meta"] = (
            pix
            | (depth_packed << _DEPTH_SHIFT)
            | jnp.where(survive, _ALIVE, 0)
            | jnp.where(exhausted, _EXH, 0)
            | jnp.where(bs["delta"], _PDELTA, 0)
        )
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((n_pix, 8)),
        "cursor": jnp.int32(0),  # global sample counter
        "state": jnp.zeros((n_lanes, _NCOLS))
        .at[:, 5].set(1.0)  # rd z
        .at[:, _THR].set(1.0)
        .at[:, _ETA2].set(1.0)
        .at[:, _PPDF].set(1.0),
        "meta": jnp.full((n_lanes,), _PDELTA, jnp.int32),
        "n_vert": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond, body, init)
    return {
        "image": out["film"][:, 0:3],
        "sqr": out["film"][:, 3:6],
        "weight": out["film"][:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
    }


def fused_supported(scene, cfg, nee: bool = True) -> bool:
    """Host-side gate for the Pallas bounce megakernel (ops/bounce_pallas):
    untextured area-light scenes using only in-kernel BSDF models and
    small enough for the unrolled in-VMEM triangle sweep."""
    from ..ops import bounce_pallas as bp

    return bool(
        nee
        and len(cfg.bsdf_types) > 0
        and all(t in bp.SUPPORTED_TYPES for t in cfg.bsdf_types)
        and not cfg.has_bump
        and not cfg.has_medium
        and scene.tri_v0.shape[0] <= bp.MAX_TRIS
        and 1 <= scene.em_tri_idx.shape[0] <= 64
        and scene.env_pdf.shape[0] <= 1
        and scene.pt_pos.shape[0] == 0
        and scene.textures.shape[1] <= 1
        and cfg.width * cfg.height <= _PIX_MASK
    )


@partial(jax.jit, static_argnames=(
    "n_lanes", "spp", "width", "height", "max_depth", "rr_depth",
    "fov_axis", "bsdf_types", "interpret",
))
def render_pool_fused(
    scene,
    key,
    n_lanes: int,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    fov_axis: str = "x",
    bsdf_types: tuple = (0,),
    interpret: bool = False,
):
    """render_pool with the whole bounce in one Pallas megakernel.

    Same regenerating-lane-pool driver (regen + film scatter stay in XLA);
    the per-bounce physics runs in ops/bounce_pallas.diffuse_bounce. Lane
    state is attribute-major [16, n_lanes] so kernel tiles are [RT, 128]
    blocks. Callers must pass fused_supported scenes; NEE is always on.
    """
    from ..ops import bounce_pallas as bp

    n_pix = width * height
    assert n_pix <= _PIX_MASK
    assert max_depth <= _DEPTH_MASK + 1
    assert n_lanes % (bp.RT * 128) == 0, n_lanes
    total = n_pix * spp
    r_rows = n_lanes // 128
    tri_rows, em_rows, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    n_em = scene.em_tri_idx.shape[0]

    def cond(c):
        meta = c["meta"]
        return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

    def body(c):
        k = jax.random.fold_in(key, c["step"])
        k_regen, k_bounce = jax.random.split(k, 2)

        st = c["state"]  # [16, N]
        meta = c["meta"]  # [N]
        alive = (meta & _ALIVE) != 0
        exhausted = (meta & _EXH) != 0
        pix = meta & _PIX_MASK

        # --- Regenerate dead lanes (same dynamic counter as render_pool) ---
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
            ro_n.T, rd_n.T, jnp.ones((3, n_lanes)), jnp.zeros((3, n_lanes)),
            jnp.ones((2, n_lanes)), jnp.zeros((2, n_lanes)),
        ], axis=0)
        st = jnp.where(start[None, :], fresh, st)
        meta = (
            pix
            | jnp.where(alive | start, _ALIVE, 0)
            | jnp.where(exhausted, _EXH, 0)
            | jnp.where(start, _PDELTA, meta & _PDELTA)
            | jnp.where(start, 0, meta & (_DEPTH_MASK << _DEPTH_SHIFT))
        )

        # --- One bounce: the megakernel ---
        rand = jax.random.uniform(k_bounce, (bp.RAND_ROWS, r_rows, 128))
        nstate, nmeta, splat = bp.bounce(
            st.reshape(16, r_rows, 128),
            meta.reshape(r_rows, 128),
            rand,
            tri_rows, em_rows, env_row,
            n_tris=n_tris, n_em=n_em,
            max_depth=max_depth, rr_depth=rr_depth,
            types=bsdf_types, interpret=interpret,
        )
        c["state"] = nstate.reshape(16, n_lanes)
        c["meta"] = nmeta.reshape(n_lanes)

        sp = splat.reshape(8, n_lanes)
        c["n_vert"] = c["n_vert"] + jnp.sum(sp[7])
        rows = jnp.concatenate([sp[0:7].T, jnp.zeros((n_lanes, 1))], axis=-1)
        c["film"] = c["film"].at[pix].add(rows)
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((n_pix, 8)),
        "cursor": jnp.int32(0),
        "state": jnp.zeros((16, n_lanes))
        .at[5].set(1.0)  # rd z
        .at[_THR].set(1.0)
        .at[_ETA2].set(1.0)
        .at[_PPDF].set(1.0),
        "meta": jnp.full((n_lanes,), _PDELTA, jnp.int32),
        "n_vert": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond, body, init)
    return {
        "image": out["film"][:, 0:3],
        "sqr": out["film"][:, 3:6],
        "weight": out["film"][:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
    }


def render_wavefront(scene, cfg, spp: int = 16, seed: int = 1234,
                     n_lanes: int = 1 << 18, nee: bool = True):
    """Host-facing wrapper matching renderer.render's output dict."""
    import numpy as np

    # Interpret-mode Pallas is for tests; route real CPU renders to the
    # XLA pool instead.
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and fused_supported(scene, cfg, nee):
        out = render_pool_fused_striped(
            scene, jax.random.PRNGKey(seed), spp=spp,
            width=cfg.width, height=cfg.height,
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            fov_axis=cfg.fov_axis, bsdf_types=tuple(cfg.bsdf_types),
        )
    else:
        out = render_pool(
            scene, jax.random.PRNGKey(seed),
            n_lanes=min(n_lanes, cfg.width * cfg.height * spp),
            spp=spp, width=cfg.width, height=cfg.height,
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth, nee=nee,
            bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
            has_bump=cfg.has_bump,
        )
    image = np.asarray(out["image"])
    weight = np.asarray(out["weight"])
    return {
        "image": (image / np.maximum(weight, 1.0)[:, None]).reshape(
            cfg.height, cfg.width, 3
        ),
        "sqr": np.asarray(out["sqr"]).reshape(cfg.height, cfg.width, 3),
        "weight": weight.reshape(cfg.height, cfg.width),
        "raw": image.reshape(cfg.height, cfg.width, 3),
        "n_vertices": int(out["n_vertices"]),
        "steps": int(out["steps"]),
    }


@partial(jax.jit, static_argnames=(
    "spp", "width", "height", "max_depth", "rr_depth",
    "fov_axis", "bsdf_types", "interpret",
))
def render_pool_fused_striped(
    scene,
    key,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    fov_axis: str = "x",
    bsdf_types: tuple = (0,),
    interpret: bool = False,
):
    """Pixel-stationary megakernel pool: lane i owns pixel i.

    The global-counter pool's film scatter costs ~2 ms/step on TPU
    (XLA scatter is ~14 ns/row serially; profiled 75% of the whole
    step once the bounce itself became a 0.2 ms megakernel). Binding
    each lane to one pixel makes the film update a DENSE per-lane add —
    no scatter, no regeneration cumsum, no global counter — at the cost
    of a static per-lane budget (spp samples): the wave drains until the
    slowest lane finishes, a measured ~1.8-2.1x occupancy tail. Dense
    adds win as long as the per-step body is scatter-dominated, which
    is exactly the fused-megakernel regime.

    Returns the same dict as render_pool_fused.
    """
    from ..ops import bounce_pallas as bp

    n_pix = width * height
    tile = bp.RT * 128
    n_lanes = ((n_pix + tile - 1) // tile) * tile
    assert max_depth <= _DEPTH_MASK + 1
    r_rows = n_lanes // 128
    tri_rows, em_rows, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    n_em = scene.em_tri_idx.shape[0]
    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    in_image = lane < n_pix
    px_base = (lane % width).astype(jnp.float32)
    py_base = (lane // width).astype(jnp.float32)

    # meta reuses the pix field (bits 0..19) as the per-lane sample count.
    def cond(c):
        meta = c["meta"]
        return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

    def body(c):
        k = jax.random.fold_in(key, c["step"])
        k_regen, k_bounce = jax.random.split(k, 2)

        st = c["state"]  # [16, N]
        meta = c["meta"]
        alive = (meta & _ALIVE) != 0
        exhausted = (meta & _EXH) != 0
        count = meta & _PIX_MASK

        # --- Regenerate dead lanes on their own pixel ---
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
            jnp.ones((2, n_lanes)), jnp.zeros((2, n_lanes)),
        ], axis=0)
        st = jnp.where(start[None, :], fresh, st)
        meta = (
            count
            | jnp.where(alive | start, _ALIVE, 0)
            | jnp.where(exhausted, _EXH, 0)
            | jnp.where(start, _PDELTA, meta & _PDELTA)
            | jnp.where(start, 0, meta & (_DEPTH_MASK << _DEPTH_SHIFT))
        )

        rand = jax.random.uniform(k_bounce, (bp.RAND_ROWS, r_rows, 128))
        nstate, nmeta, splat = bp.bounce(
            st.reshape(16, r_rows, 128),
            meta.reshape(r_rows, 128),
            rand,
            tri_rows, em_rows, env_row,
            n_tris=n_tris, n_em=n_em,
            max_depth=max_depth, rr_depth=rr_depth,
            types=bsdf_types, interpret=interpret,
        )
        c["state"] = nstate.reshape(16, n_lanes)
        c["meta"] = nmeta.reshape(n_lanes)

        sp = splat.reshape(8, n_lanes)
        c["n_vert"] = c["n_vert"] + jnp.sum(sp[7])
        # Dense per-lane accumulation — lane == pixel, no scatter.
        c["film"] = c["film"] + sp[0:7].T
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((n_lanes, 7)),
        "state": jnp.zeros((16, n_lanes))
        .at[5].set(1.0)
        .at[_THR].set(1.0)
        .at[_ETA2].set(1.0)
        .at[_PPDF].set(1.0),
        "meta": jnp.full((n_lanes,), _PDELTA, jnp.int32),
        "n_vert": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond, body, init)
    film = out["film"][:n_pix]
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
    }
