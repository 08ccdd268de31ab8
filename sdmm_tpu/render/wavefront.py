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
    "bsdf_types", "fov_axis", "has_bump", "has_sss",
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
    has_sss: bool = False,
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

        if has_sss:
            from .subsurface import sss_lo_factor

            li = li + jnp.where(
                alive[:, None], thr * sss_lo_factor(scene, it, -rd), 0.0
            )

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
    small enough for the unrolled in-VMEM triangle sweep.

    SDMM_TPU_NO_FUSED=1 opts out (operational escape hatch only; the
    former dielectric Mosaic compile error — a bool-vector jnp.where
    lowering to an unsupported i8->i1 truncation — is fixed by pure-i1
    mask blends in the bounce kernel, verified on real TPU)."""
    import os

    from ..ops import bounce_pallas as bp

    return bool(
        os.environ.get("SDMM_TPU_NO_FUSED") != "1"
        and nee
        and len(cfg.bsdf_types) > 0
        and all(t in bp.SUPPORTED_TYPES for t in cfg.bsdf_types)
        and not cfg.has_bump
        and not cfg.has_medium
        and not cfg.has_sss
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


@partial(jax.jit, static_argnames=(
    "spp", "width", "height", "max_depth", "rr_depth",
    "fov_axis", "bsdf_types", "interpret",
))
def render_pool_fused_blocked(
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
    """Striped megakernel pool with 2D-blocked tiles + whole-tile skip.

    Two measured facts drive this design (PERF.md round-2): (1) the
    pixel-stationary pool's occupancy is 0.23 because per-pixel mean path
    length is heavy-tailed (max ~4x mean), and (2) shuffling pixels across
    lanes barely helps — the tail is paid per-lane either way while the
    kernel runs ALL tiles every step. So instead of fighting per-lane
    variance, exploit its spatial correlation: map each kernel lane tile
    to a compact 2D image block (slow pixels cluster — back wall vs
    emitter), and pass a per-tile alive flag into the megakernel so a
    fully-drained tile passes through at DMA cost with no sweep. The film
    update stays a dense per-lane add.
    """
    from ..ops import bounce_pallas as bp

    n_pix = width * height
    chunked = scene.tri_v0.shape[0] > bp.MAX_UNROLL_TRIS
    rt = bp.RT_CHUNKED if chunked else bp.RT
    tile = rt * 128
    bw, bh = 128, rt
    gx = -(-width // bw)
    gy = -(-height // bh)
    n_tiles = gx * gy
    n_lanes = n_tiles * tile
    assert max_depth <= _DEPTH_MASK + 1
    assert spp <= _PIX_MASK
    r_rows = n_lanes // 128
    tri_rows, em_rows, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    n_em = scene.em_tri_idx.shape[0]

    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    t_idx = lane // tile
    o = lane % tile
    x = (t_idx % gx) * bw + o % 128
    y = (t_idx // gx) * bh + o // 128
    in_image = (x < width) & (y < height)
    pix_of_lane = jnp.where(in_image, y * width + x, 0)
    px_base = x.astype(jnp.float32)
    py_base = y.astype(jnp.float32)
    budget = jnp.where(in_image, spp, 0)

    # meta bits 0..19 hold the per-lane sample count.
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

        live = (meta & _ALIVE) != 0
        tile_alive = jnp.any(live.reshape(n_tiles, tile), axis=1)

        rand = jax.random.uniform(k_bounce, (bp.RAND_ROWS, r_rows, 128))
        nstate, nmeta, splat = bp.bounce(
            st.reshape(16, r_rows, 128),
            meta.reshape(r_rows, 128),
            rand,
            tri_rows, em_rows, env_row,
            n_tris=n_tris, n_em=n_em,
            max_depth=max_depth, rr_depth=rr_depth,
            types=bsdf_types, interpret=interpret,
            tile_alive=tile_alive,
        )
        c["state"] = nstate.reshape(16, n_lanes)
        c["meta"] = nmeta.reshape(n_lanes)

        sp = splat.reshape(8, n_lanes)
        c["n_vert"] = c["n_vert"] + jnp.sum(sp[7])
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
    film = jnp.zeros((n_pix + 1, 7)).at[
        jnp.where(in_image, pix_of_lane, n_pix)
    ].set(out["film"])[:n_pix]
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
    }


@partial(jax.jit, static_argnames=(
    "spp", "spp_pilot", "width", "height", "max_depth", "rr_depth",
    "fov_axis", "bsdf_types", "interpret",
))
def render_pool_fused_sorted(
    scene,
    key,
    spp: int,
    width: int,
    height: int,
    spp_pilot: int = 8,
    max_depth: int = 10,
    rr_depth: int = 10,
    fov_axis: str = "x",
    bsdf_types: tuple = (0,),
    interpret: bool = False,
):
    """Cost-sorted striped megakernel pool (pilot + balanced main pass).

    The pixel-stationary pool's 0.23 occupancy comes from heavy-tailed
    per-pixel mean path length (max ~4x mean): lanes bound to fast pixels
    idle while slow pixels drain. Blocked tile-skip alone barely helps
    because every 8192-pixel block contains some slow pixels. This driver
    MEASURES the per-pixel cost instead of predicting it: a pilot pass
    renders spp_pilot samples pixel-stationary while accumulating each
    pixel's actual path-vertex count, then the remaining spp - spp_pilot
    samples run with pixels argsorted by measured cost, so each kernel
    tile holds equal-cost pixels. Fast tiles exhaust early and pass
    through the megakernel at DMA cost (tile_alive skip); slow tiles stay
    fully occupied to the end. Pilot samples count toward the image, so
    the only overhead is the pilot's own occupancy tail.

    Film stays a dense per-lane add in both phases (lane <-> pixel is a
    bijection per phase); the two lane-space films are un-permuted and
    summed once at the end.
    """
    from ..ops import bounce_pallas as bp

    n_pix = width * height
    chunked = scene.tri_v0.shape[0] > bp.MAX_UNROLL_TRIS
    rt = bp.RT_CHUNKED if chunked else bp.RT
    tile = rt * 128
    n_tiles = -(-n_pix // tile)
    n_lanes = n_tiles * tile
    assert max_depth <= _DEPTH_MASK + 1
    assert 0 < spp_pilot < spp and spp <= _PIX_MASK
    r_rows = n_lanes // 128
    tri_rows, em_rows, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    n_em = scene.em_tri_idx.shape[0]
    lane = jnp.arange(n_lanes, dtype=jnp.int32)

    def run_phase(pix_of_lane, budget, phase_spp, k_phase):
        """One regenerating pass: lane i renders pix_of_lane[i] for
        phase_spp samples (budget masks out-of-image lanes). Returns
        (film [n_lanes, 8], steps); film col 7 counts path vertices."""
        px_base = (pix_of_lane % width).astype(jnp.float32)
        py_base = (pix_of_lane // width).astype(jnp.float32)

        def cond(c):
            meta = c["meta"]
            return jnp.any(((meta & _ALIVE) != 0) | ((meta & _EXH) == 0))

        def body(c):
            k = jax.random.fold_in(k_phase, c["step"])
            k_regen, k_bounce = jax.random.split(k, 2)
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
            live = (meta & _ALIVE) != 0
            tile_alive = jnp.any(live.reshape(n_tiles, tile), axis=1)
            c["ats"] = c["ats"] + jnp.sum(tile_alive.astype(jnp.int32))

            rand = jax.random.uniform(k_bounce, (bp.RAND_ROWS, r_rows, 128))
            nstate, nmeta, splat = bp.bounce(
                st.reshape(16, r_rows, 128),
                meta.reshape(r_rows, 128),
                rand,
                tri_rows, em_rows, env_row,
                n_tris=n_tris, n_em=n_em,
                max_depth=max_depth, rr_depth=rr_depth,
                types=bsdf_types, interpret=interpret,
                tile_alive=tile_alive,
            )
            c["state"] = nstate.reshape(16, n_lanes)
            c["meta"] = nmeta.reshape(n_lanes)
            c["film"] = c["film"] + splat.reshape(8, n_lanes).T
            c["step"] = c["step"] + 1
            return c

        init = {
            "step": jnp.int32(0),
            "ats": jnp.int32(0),  # alive-tile-steps (skip diagnostics)
            "film": jnp.zeros((n_lanes, 8)),
            "state": jnp.zeros((16, n_lanes))
            .at[5].set(1.0)
            .at[_THR].set(1.0)
            .at[_ETA2].set(1.0)
            .at[_PPDF].set(1.0),
            "meta": jnp.full((n_lanes,), _PDELTA, jnp.int32),
        }
        out = jax.lax.while_loop(cond, body, init)
        return out["film"], out["step"], out["ats"]

    k_a, k_b = jax.random.split(key)
    in_image = lane < n_pix
    pix_a = jnp.where(in_image, lane, 0)
    film_a, steps_a, ats_a = run_phase(
        pix_a, jnp.where(in_image, spp_pilot, 0), spp_pilot, k_a
    )

    # Measured per-pixel cost -> equal-cost tiles for the main pass.
    # Padding lanes carry cost -1 so they sort to the front and share one
    # (skipped-early) tile.
    cost = jnp.where(in_image, film_a[:, 7], -1.0)
    order = jnp.argsort(cost).astype(jnp.int32)  # lane j -> pixel order[j]
    pix_b = order
    valid_b = cost[order] >= 0.0
    film_b, steps_b, ats_b = run_phase(
        jnp.where(valid_b, order, 0),
        jnp.where(valid_b, spp - spp_pilot, 0),
        spp - spp_pilot, k_b,
    )

    film = (
        jnp.zeros((n_pix + 1, 8))
        .at[jnp.where(in_image, pix_a, n_pix)].add(film_a)
        .at[jnp.where(valid_b, pix_b, n_pix)].add(film_b)
    )[:n_pix]
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": jnp.sum(film[:, 7]),
        "steps": steps_a + steps_b,
        "alive_tile_steps": ats_a + ats_b,
        "total_tile_steps": (steps_a + steps_b) * n_tiles,
    }


@partial(jax.jit, static_argnames=(
    "spp", "spp_pilot", "width", "height", "max_depth", "rr_depth",
    "fov_axis", "bsdf_types", "interpret", "host_rand",
))
def render_pool_fused_sorted2(
    scene,
    key,
    spp: int,
    width: int,
    height: int,
    spp_pilot: int = 8,
    max_depth: int = 10,
    rr_depth: int = 10,
    fov_axis: str = "x",
    bsdf_types: tuple = (0,),
    interpret: bool = False,
    host_rand: bool = False,
):
    """Cost-sorted pool over the fully-fused step kernel.

    Same pilot + cost-sorted schedule as render_pool_fused_sorted, but
    each while-loop iteration is ONE pallas_call (ops/bounce_pallas.step):
    lane regeneration, camera rays, PRNG, the bounce, and the film
    accumulation all run in-kernel with state/meta/film aliased in place.
    XLA's per-step work shrinks to a 1 MB meta reduction for the tile
    alive flags. Random numbers come from the TPU PRNG seeded per
    (key, phase, step, tile); `host_rand` (forced under interpret, which
    has no PRNG lowering) feeds threefry rows instead.
    """
    from ..ops import bounce_pallas as bp

    host_rand = host_rand or interpret
    n_pix = width * height
    chunked = scene.tri_v0.shape[0] > bp.MAX_UNROLL_TRIS
    rt = bp.RT_CHUNKED if chunked else bp.RT
    tile = rt * 128
    n_tiles = -(-n_pix // tile)
    n_lanes = n_tiles * tile
    assert max_depth <= _DEPTH_MASK + 1
    assert 0 < spp_pilot < spp and spp <= _PIX_MASK
    r_rows = n_lanes // 128
    tri_rows, em_rows, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    n_em = scene.em_tri_idx.shape[0]
    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    cam = bp.build_cam_params(scene, width, height, fov_axis)
    seed_base = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)

    def run_phase(pix_of_lane, budget, phase_id, k_phase):
        pxpy = jnp.stack([
            (pix_of_lane % width).astype(jnp.float32),
            (pix_of_lane // width).astype(jnp.float32),
            budget.astype(jnp.float32),
        ]).reshape(3, r_rows, 128)

        def cond(c):
            return jnp.any(c["tile_alive"] != 0)

        def body(c):
            seed2 = jnp.stack([
                seed_base + jnp.int32(phase_id), c["step"]
            ]).astype(jnp.int32)
            if host_rand:
                k = jax.random.fold_in(jax.random.fold_in(
                    k_phase, phase_id), c["step"])
                rand = jax.random.uniform(
                    k, (bp.RAND_ROWS + 2, r_rows, 128))
            else:
                rand = None
            nstate, nmeta, nfilm = bp.step(
                c["state"], c["meta"], c["film"], c["tile_alive"],
                cam, seed2, pxpy, tri_rows, em_rows, env_row,
                n_tris=n_tris, n_em=n_em,
                max_depth=max_depth, rr_depth=rr_depth,
                types=bsdf_types, width=width, height=height,
                interpret=interpret, rand=rand,
            )
            c["state"] = nstate
            c["meta"] = nmeta
            c["film"] = nfilm
            runnable = ((nmeta & _ALIVE) != 0) | ((nmeta & _EXH) == 0)
            c["tile_alive"] = jnp.any(
                runnable.reshape(n_tiles, tile), axis=1
            ).astype(jnp.int32)
            c["ats"] = c["ats"] + jnp.sum(c["tile_alive"])
            c["step"] = c["step"] + 1
            return c

        init = {
            "step": jnp.int32(0),
            "ats": jnp.int32(0),
            "film": jnp.zeros((8, r_rows, 128)),
            "state": jnp.zeros((16, r_rows, 128))
            .at[5].set(1.0)
            .at[6:9].set(1.0)
            .at[12:14].set(1.0),
            "meta": jnp.full((r_rows, 128), _PDELTA, jnp.int32),
            "tile_alive": jnp.ones((n_tiles,), jnp.int32),
        }
        out = jax.lax.while_loop(cond, body, init)
        return (out["film"].reshape(8, n_lanes).T, out["step"], out["ats"])

    in_image = lane < n_pix
    pix_a = jnp.where(in_image, lane, 0)
    film_a, steps_a, ats_a = run_phase(
        pix_a, jnp.where(in_image, spp_pilot, 0), 0, key
    )

    cost = jnp.where(in_image, film_a[:, 7], -1.0)
    order = jnp.argsort(cost).astype(jnp.int32)
    valid_b = cost[order] >= 0.0
    film_b, steps_b, ats_b = run_phase(
        jnp.where(valid_b, order, 0),
        jnp.where(valid_b, spp - spp_pilot, 0),
        1, key,
    )

    film = (
        jnp.zeros((n_pix + 1, 8))
        .at[jnp.where(in_image, pix_a, n_pix)].add(film_a)
        .at[jnp.where(valid_b, order, n_pix)].add(film_b)
    )[:n_pix]
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": jnp.sum(film[:, 7]),
        "steps": steps_a + steps_b,
        "alive_tile_steps": ats_a + ats_b,
        "total_tile_steps": (steps_a + steps_b) * n_tiles,
    }


@partial(jax.jit, static_argnames=(
    "spp", "width", "height", "max_depth", "rr_depth",
    "fov_axis", "bsdf_types", "groups", "interpret",
))
def render_pool_fused_shuffled(
    scene,
    key,
    spp: int,
    width: int,
    height: int,
    max_depth: int = 10,
    rr_depth: int = 10,
    fov_axis: str = "x",
    bsdf_types: tuple = (0,),
    groups: int = 8,
    interpret: bool = False,
):
    """Megakernel pool with shuffled multi-pixel lane ownership.

    The pixel-stationary striped pool (below) removed the film scatter but
    measured occupancy 0.23: its tail is per-pixel workload heterogeneity
    (back-wall pixels average ~3x the path length of emitter pixels, and a
    lane bound to one pixel drains spp x that pixel's mean path). Here lane
    i owns `groups` pixels drawn by a random permutation of the image, one
    slot at a time — the per-lane total work then averages over `groups`
    i.i.d. pixels (plus spp paths each), shrinking the straggler tail by
    ~sqrt(groups) while the film update stays DENSE: a [groups, n_lanes, 7]
    accumulator updated with a slot-onehot add (no scatter; same film byte
    traffic as the striped pool since groups * n_lanes ~= n_pix). The image
    is assembled with one final scatter through the permutation.

    Estimator identical to render_pool_fused: every pixel receives exactly
    spp samples from exactly one (lane, slot).
    """
    from ..ops import bounce_pallas as bp

    n_pix = width * height
    chunked = scene.tri_v0.shape[0] > bp.MAX_UNROLL_TRIS
    tile = (bp.RT_CHUNKED if chunked else bp.RT) * 128
    n_lanes = -(-n_pix // (groups * tile)) * tile
    assert max_depth <= _DEPTH_MASK + 1
    assert spp * groups <= _PIX_MASK
    r_rows = n_lanes // 128
    tri_rows, em_rows, env_row = bp.build_tables(scene)
    n_tris = scene.tri_v0.shape[0]
    n_em = scene.em_tri_idx.shape[0]
    lane = jnp.arange(n_lanes, dtype=jnp.int32)

    # Pixel assignment: slot c of lane i renders pixel perm[c*n_lanes + i].
    # (lane, slot) pairs with c*n_lanes + i >= n_pix are unused; the
    # per-lane budget below encodes exactly that bound.
    perm = jax.random.permutation(jax.random.fold_in(key, 0x5bf), n_pix)
    perm_padded = jnp.concatenate([
        perm.astype(jnp.int32),
        jnp.zeros((groups * n_lanes - n_pix,), jnp.int32),
    ])
    budget = spp * jnp.maximum(0, (n_pix - 1 - lane) // n_lanes + 1)

    # meta bits 0..19 hold the per-lane sample counter s; slot = s // spp.
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
        s = meta & _PIX_MASK

        # --- Regenerate dead lanes on their current slot's pixel ---
        need = ~alive & ~exhausted
        start = need & (s < budget)
        exhausted = exhausted | (need & ~start)
        slot = s // spp
        pix_n = perm_padded[slot * n_lanes + lane]
        u = jax.random.uniform(k_regen, (n_lanes, 2))
        px = (pix_n % width).astype(jnp.float32) + u[:, 0]
        py = (pix_n // width).astype(jnp.float32) + u[:, 1]
        ro_n, rd_n = generate_rays(
            scene, jnp.stack([px, py], axis=-1), width, height, fov_axis
        )
        s = jnp.where(start, s + 1, s)
        fresh = jnp.concatenate([
            ro_n.T, rd_n.T, jnp.ones((3, n_lanes)), jnp.zeros((3, n_lanes)),
            jnp.ones((2, n_lanes)), jnp.zeros((2, n_lanes)),
        ], axis=0)
        st = jnp.where(start[None, :], fresh, st)
        meta = (
            s
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
        # Dense slot-onehot film add: a terminated path's slot is
        # (s-1)//spp (s was bumped at its regeneration and is untouched
        # while the path is alive).
        cur = jnp.maximum(s - 1, 0) // spp
        oh = (jnp.arange(groups, dtype=jnp.int32)[:, None] == cur[None, :])
        c["film"] = c["film"] + oh.astype(jnp.float32)[:, :, None] * sp[0:7].T[None]
        c["step"] = c["step"] + 1
        return c

    init = {
        "step": jnp.int32(0),
        "film": jnp.zeros((groups, n_lanes, 7)),
        "state": jnp.zeros((16, n_lanes))
        .at[5].set(1.0)
        .at[_THR].set(1.0)
        .at[_ETA2].set(1.0)
        .at[_PPDF].set(1.0),
        "meta": jnp.full((n_lanes,), _PDELTA, jnp.int32),
        "n_vert": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond, body, init)
    # film[c, i] holds pixel perm[c*n_lanes + i]; un-permute once.
    film_flat = out["film"].reshape(groups * n_lanes, 7)[:n_pix]
    film = jnp.zeros((n_pix, 7)).at[perm].set(film_flat)
    return {
        "image": film[:, 0:3],
        "sqr": film[:, 3:6],
        "weight": film[:, 6],
        "n_vertices": out["n_vert"],
        "steps": out["step"],
    }


def render_wavefront(scene, cfg, spp: int = 16, seed: int = 1234,
                     n_lanes: int = 1 << 18, nee: bool = True):
    """Host-facing wrapper matching renderer.render's output dict."""
    import numpy as np

    if cfg.has_medium:
        # The lane pools carry no medium state: a media scene would be
        # SILENTLY rendered as vacuum (the same hole VERDICT r3 #4
        # flagged for the guided integrator). Route media scenes to the
        # scan renderer, whose trace_wave has the full volumetric path.
        from .renderer import render as scan_render

        out = scan_render(scene, cfg, spp=spp, seed=seed, nee=nee)
        out["n_vertices"] = 0
        out["steps"] = 0
        return out

    if cfg.has_sss and not cfg.sss_baked:
        from .subsurface import bake_subsurface

        scene = bake_subsurface(scene, cfg, seed=seed)

    # Interpret-mode Pallas is for tests; route real CPU renders to the
    # XLA pool instead.
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and fused_supported(scene, cfg, nee):
        if spp >= 4:
            out = render_pool_fused_sorted2(
                scene, jax.random.PRNGKey(seed), spp=spp,
                spp_pilot=max(1, min(8, spp // 4)),
                width=cfg.width, height=cfg.height,
                max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
                fov_axis=cfg.fov_axis, bsdf_types=tuple(cfg.bsdf_types),
            )
        else:
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
            has_bump=cfg.has_bump, has_sss=cfg.has_sss,
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
