"""Practical Path Guiding (Müller et al. 2017) — comparison integrator.

TPU-native re-design of the reference's ``guided_path`` plugin
(reference: mitsuba/src/integrators/path/guided_path.cpp — QuadTreeNode
:162, DTree :378, STree :852, iterative budget doubling, learned
bsdfSamplingFraction :663-721 + AdamOptimizer :73-131; protocol config
test-suite/scenes/_integrators/ppg.xml). TPU departures, each chosen to
preserve the reference's *distribution* exactly while removing
pointer-tree traversal from the per-ray hot path:

- The adaptive per-leaf directional quadtree over the cylindrical
  (cosθ, φ) square (canonicalToDir, guided_path.cpp:85-114) is stored as
  a dense [leaves, RES², RES=64] histogram (complete depth-6 quadtree,
  breadth-last). Instead of descending an explicit tree per ray, the
  adaptive structure is PROJECTED once per iteration onto the finest
  level (``project_adaptive``): every node that stops subdividing (flux
  ≤ rho·total — the reference's 1% rule, QuadTreeNode::refine) spreads
  its flux uniformly over its descendant finest cells. Sampling the
  projected histogram uniformly-within-cell is then *identical in
  distribution* to the reference's hierarchical descent + uniform-within
  -stopped-node, and the pdf is the same piecewise-constant function —
  but the hot path is two small row gathers + 64-wide CDFs per vertex.
- Recording always happens at the finest granularity (the dense grid has
  no "unbuilt" nodes); the reference records into last iteration's
  refined structure. Strictly more directional information is kept.
- Directional box filter (ppg.xml directionalFilter=box): records splat
  bilinearly over the 4 nearest finest cells. Spatial stochastic filter
  (spatialFilter=stochastic): the record position is jittered by ±half
  the leaf diagonal before the leaf lookup (Vertex::commit
  EStochasticBox, guided_path.cpp:1785-1800).
- Learned bsdfSamplingFraction (optimizeBsdfSamplingFraction,
  guided_path.cpp:676-700): per-leaf trainable θ with fraction=σ(θ),
  loss gradient −(product/mixPdf)^p / woPdf · (bsdfPdf − dTreePdf)·σ'(θ)
  + 0.01·θ L2, p=1 (KL) or 2 (variance), stepped by Adam(lr=0.01,
  β=0.9/0.999, clamp ±20). TPU batching: per-leaf gradients are
  segment-summed over sample chunks and Adam steps once per chunk
  (the reference steps per sample; the mini-batch variant is the
  deterministic batched equivalent). Default "none" — matching the
  reference's own test-suite protocol (ppg.xml:27).
- Spatial binary tree split threshold grows as
  sqrt(2^iter · sppPerPass / 4) · sTreeThreshold (guided_path.cpp:1115),
  sTreeThreshold = 4000 (ppg.xml:29).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdf as bsdf_mod
from ..core.frame import to_local, to_world
from ..render import film as film_mod
from ..render.intersect import intersect, surface_interaction
from ..render.volpath import shading_frame
from ..scene import emitters
from ..scene.sensor import generate_rays
from .stree import STree, find_leaf

RES = 64
LEVELS = 6  # log2(RES): depth of the complete quadtree
FOUR_PI = 4.0 * jnp.pi


def dir_to_uv(d: jnp.ndarray):
    """Direction → (y=cosθ, x=φ) unit square coords (reference
    dirToCanonical, guided_path.cpp:197-261)."""
    ct = jnp.clip((d[..., 2] + 1.0) * 0.5, 0.0, 1.0 - 1e-7)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    u = (phi / (2.0 * jnp.pi)) % 1.0
    return ct, u


def dir_to_cell(d: jnp.ndarray) -> jnp.ndarray:
    ct, u = dir_to_uv(d)
    xi = jnp.clip((u * RES).astype(jnp.int32), 0, RES - 1)
    yi = jnp.clip((ct * RES).astype(jnp.int32), 0, RES - 1)
    return yi * RES + xi


def cell_to_dir(cell: jnp.ndarray, jitter: jnp.ndarray) -> jnp.ndarray:
    """Cell + in-cell jitter → direction (uniform within the cell in the
    cylindrical measure → exactly invertible pdf; reference
    canonicalToDir, guided_path.cpp:85-96)."""
    yi = (cell // RES).astype(jnp.float32)
    xi = (cell % RES).astype(jnp.float32)
    ct = ((yi + jitter[..., 0]) / RES) * 2.0 - 1.0
    phi = ((xi + jitter[..., 1]) / RES) * 2.0 * jnp.pi
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


@partial(jax.jit, static_argnames=("rho",))
def project_adaptive(hist: jnp.ndarray, rho: float = 0.01):
    """[L, RES²] raw flux → (eff [L, RES²], eff_row [L, RES], total [L]).

    Projects the reference's adaptive quadtree onto the finest level:
    descend the mip pyramid; a node with flux ≤ rho·total stops
    subdividing and spreads its flux uniformly (÷4 per level) over its
    descendants. Sampling/pdf on ``eff`` are then exactly the reference's
    adaptive-tree distribution (QuadTreeNode::refine's 1% rule)."""
    L = hist.shape[0]
    h = hist.reshape(L, RES, RES)
    mips = [h]
    for _ in range(LEVELS):
        m = mips[-1]
        r = m.shape[1] // 2
        mips.append(m.reshape(L, r, 2, r, 2).sum(axis=(2, 4)))
    mips = mips[::-1]  # level 0 = [L,1,1] root
    total = mips[0][:, 0, 0]
    thresh = rho * total
    val = mips[0]
    stopped = mips[0] <= thresh[:, None, None]
    for lvl in range(1, LEVELS + 1):
        val_up = jnp.repeat(jnp.repeat(val, 2, axis=1), 2, axis=2)
        stop_up = jnp.repeat(jnp.repeat(stopped, 2, axis=1), 2, axis=2)
        val = jnp.where(stop_up, val_up * 0.25, mips[lvl])
        stopped = stop_up | (mips[lvl] <= thresh[:, None, None])
    eff = val.reshape(L, RES * RES)
    return eff, val.sum(axis=2), total


def grid_pdf(eff2d_g: jnp.ndarray, total_g: jnp.ndarray,
             d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of directions under per-ray gathered projected
    rows. ``eff2d_g``: [N, RES] — the RES-cell row containing d's cosθ
    band; ``total_g``: [N] leaf totals."""
    _, u = dir_to_uv(d)
    xi = jnp.clip((u * RES).astype(jnp.int32), 0, RES - 1)
    mass = jnp.take_along_axis(eff2d_g, xi[..., None], axis=-1)[..., 0]
    frac = jnp.where(total_g > 0, mass / jnp.maximum(total_g, 1e-20), 0.0)
    return frac * (RES * RES) / FOUR_PI


def _cdf_pick(w: jnp.ndarray, u: jnp.ndarray):
    """Sample index ∝ w rows [N, R]; returns (idx, picked mass)."""
    cdf = jnp.cumsum(w, axis=-1)
    tot = cdf[..., -1:]
    uu = u[..., None] * tot
    idx = jnp.sum((uu >= cdf).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, w.shape[-1] - 1)
    m = jnp.take_along_axis(w, idx[..., None], axis=-1)[..., 0]
    return idx, m


def grid_sample(eff2d: jnp.ndarray, eff_row_g: jnp.ndarray,
                leaf: jnp.ndarray, key):
    """Two-stage (cosθ row, then φ column) CDF sampling of the projected
    histogram; uniform jitter within the finest cell — identical in
    distribution to the reference's hierarchical DTree descent.

    eff2d: [L*RES, RES] (row-major leaf rows); eff_row_g: [N, RES]
    gathered per-ray row sums."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = leaf.shape[0]
    yi, _ = _cdf_pick(eff_row_g, jax.random.uniform(k1, (n,)))
    row = eff2d[leaf * RES + yi]  # [N, RES]
    xi, _ = _cdf_pick(row, jax.random.uniform(k2, (n,)))
    j = jax.random.uniform(k3, (n, 2))
    ct = ((yi.astype(jnp.float32) + j[:, 0]) / RES) * 2.0 - 1.0
    phi = ((xi.astype(jnp.float32) + j[:, 1]) / RES) * 2.0 * jnp.pi
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


@partial(jax.jit, static_argnames=("max_depth", "rr_depth", "bsdf_fraction",
                                   "bsdf_types", "learn_fraction"))
def trace_wave_ppg(
    scene, eff2d, eff_row, total, theta, initialized, tables, aabb_lo,
    inv_norm, key, ro, rd,
    max_depth: int = 10, rr_depth: int = 10, bsdf_fraction: float = 0.5,
    bsdf_types: tuple | None = None, learn_fraction: bool = False,
):
    """PPG-guided wave; returns (li [N,3], samples for training).

    eff2d: [L*RES, RES] projected flux; eff_row: [L, RES] row sums;
    total: [L]; theta: [L] logit of the learned bsdfSamplingFraction."""
    n = ro.shape[0]

    def body(carry, inp):
        (ro, rd, throughput, eta_sq, active, li) = carry
        depth, k = inp
        hit = intersect(scene, ro, rd)
        it = surface_interaction(scene, ro, rd, hit)
        le = emitters.eval_emitter(scene, it, -rd)
        le_eff = le + jnp.where(
            hit["valid"][..., None], 0.0, emitters.env_eval(scene, rd))
        li = li + jnp.where(active[..., None], throughput * le_eff, 0.0)
        le_out = jnp.where(active[..., None], le_eff, 0.0)
        active = active & hit["valid"]

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"], types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        wi_dot_geo = jnp.sum(it["ng"] * -rd, axis=-1)
        active = active & ~(wi_dot_geo * wi_local[..., 2] < 0.0)

        c_pos = (it["p"] - aabb_lo) * inv_norm
        leaf = find_leaf(tables, c_pos)
        row_g = eff_row[leaf]  # [N, RES]
        total_g = total[leaf]
        delta_only = bsdf_mod.is_delta_only(params)
        guide_ok = initialized[leaf] & ~delta_only & (total_g > 0)
        if learn_fraction:
            frac = jax.nn.sigmoid(theta[leaf])
        else:
            frac = jnp.full((n,), bsdf_fraction)
        h = jnp.where(guide_ok, frac, 1.0)

        k_sel, k_b1, k_b2, k_g, k_rr = jax.random.split(k, 5)
        take_bsdf = (jax.random.uniform(k_sel, (n,)) < h) | ~guide_ok
        u1 = jax.random.uniform(k_b1, (n,))
        u2 = jax.random.uniform(k_b2, (n, 2))
        u0 = jax.random.uniform(jax.random.fold_in(k_b1, 7), (n,))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2, types=bsdf_types)
        d_guide = grid_sample(eff2d, row_g, leaf, k_g)
        wo_world = jnp.where(
            take_bsdf[..., None], to_world(s_ax, t_ax, n_ax, bs["wo"]), d_guide
        )
        wo_local = jnp.where(
            take_bsdf[..., None], bs["wo"], to_local(s_ax, t_ax, n_ax, d_guide)
        )
        sampled_delta = take_bsdf & bs["delta"]

        f_eval, bsdf_pdf = bsdf_mod.eval_pdf_full(params, wi_local, wo_local, types=bsdf_types)
        # pdf row for wo (may differ from the sampled row when the BSDF
        # branch was taken).
        ct_wo, _ = dir_to_uv(wo_world)
        y_wo = jnp.clip((ct_wo * RES).astype(jnp.int32), 0, RES - 1)
        pdf_row = eff2d[leaf * RES + y_wo]
        g_pdf = jnp.where(guide_ok, grid_pdf(pdf_row, total_g, wo_world), 0.0)
        mis_pdf = h * bsdf_pdf + (1.0 - h) * g_pdf
        w_smooth = f_eval / jnp.maximum(mis_pdf, 1e-20)[..., None]
        w_delta = bs["weight"] / jnp.maximum(h, 1e-6)[..., None]
        bweight = jnp.where(sampled_delta[..., None], w_delta, w_smooth)
        ok = jnp.where(
            sampled_delta,
            jnp.any(bs["weight"] > 0, axis=-1),
            (mis_pdf > 0) & jnp.any(f_eval > 0, axis=-1),
        )
        wo_dot_geo = jnp.sum(it["ng"] * wo_world, axis=-1)
        ok = ok & ~(wo_dot_geo * wo_local[..., 2] <= 0.0)
        active_next = active & ok
        cacheable = active_next & ~sampled_delta

        throughput = throughput * jnp.where(active_next[..., None], bweight, 0.0)
        eta_sq = eta_sq * jnp.where(active_next, bs["eta"] ** 2, 1.0)
        q = jax.lax.stop_gradient(jnp.minimum(jnp.max(throughput, -1) * eta_sq, 0.95))
        do_rr = depth + 1 >= rr_depth
        kill = do_rr & (jax.random.uniform(k_rr, (n,)) >= q)
        active_next = active_next & ~kill
        throughput = jnp.where(
            (do_rr & active_next)[..., None],
            throughput / jnp.maximum(q, 1e-6)[..., None], throughput,
        )
        ro_next = it["p"] + it["ng"] * jnp.where(wo_dot_geo > 0, 1e-4, -1e-4)[..., None]
        outs = {
            "le": le_out,
            "bweight": jnp.where(active_next[..., None], bweight, 0.0),
            # Unclamped combined pdf: PPG records woPdf as-is (the 0.1
            # clamp is SDMM-specific; guided_path Vertex stores woPdf).
            "wo_pdf": mis_pdf,
            "bsdf_pdf": bsdf_pdf,
            "g_pdf": g_pdf,
            # f·cos for the fraction-loss "product" term
            # (Vertex::commit: product = localRadiance·bsdfVal).
            "fcos": jnp.mean(f_eval, axis=-1),
            "cacheable": cacheable,
            "pos": c_pos,
            "leaf": leaf,
            "dir": wo_world,
            "n_vert": jnp.sum((active & (depth < max_depth)).astype(
                jnp.float32)),
        }
        return (ro_next, wo_world, throughput, eta_sq, active_next, li), outs

    keys = jax.random.split(key, max_depth + 1)
    init = (ro, rd, jnp.ones((n, 3)), jnp.ones(n), jnp.ones(n, bool), jnp.zeros((n, 3)))
    carry, outs = jax.lax.scan(
        body, init, (jnp.arange(max_depth + 1, dtype=jnp.int32), keys)
    )
    li = carry[5]

    def back(acc, xs):
        le_next, w_next = xs
        inc = le_next + w_next * acc
        return inc, inc

    _, incident = jax.lax.scan(
        back, jnp.zeros((n, 3)), (outs["le"][1:][::-1], outs["bweight"][1:][::-1])
    )
    incident = incident[::-1]
    rad = jnp.mean(incident, -1)  # localRadiance.average()
    wo_pdf = outs["wo_pdf"][:max_depth]
    valid = (
        outs["cacheable"][:max_depth]
        & jnp.isfinite(rad) & (rad >= 0) & (wo_pdf > 0)
    )
    samples = {
        "pos": jnp.nan_to_num(
            jnp.where(valid[..., None], outs["pos"][:max_depth], 0.5),
            nan=0.5).reshape(-1, 3),
        "leaf": outs["leaf"][:max_depth].reshape(-1),
        "dir": jnp.where(
            valid[..., None], outs["dir"][:max_depth],
            jnp.array([0.0, 0.0, 1.0])).reshape(-1, 3),
        # flux deposit = radiance / woPdf (DTree::record divides by woPdf)
        "weight": jnp.where(
            valid, rad / jnp.maximum(wo_pdf, 1e-20), 0.0).reshape(-1),
        "radiance": jnp.where(valid, rad, 0.0).reshape(-1),
        "product": jnp.where(
            valid, rad * outs["fcos"][:max_depth], 0.0).reshape(-1),
        "wo_pdf": wo_pdf.reshape(-1),
        "bsdf_pdf": outs["bsdf_pdf"][:max_depth].reshape(-1),
        "g_pdf": outs["g_pdf"][:max_depth].reshape(-1),
        "valid": valid.reshape(-1),
        "n_vertices": jnp.sum(outs["n_vert"]),
    }
    return li, samples


@partial(jax.jit, static_argnames=("n_chunks", "ratio_power"))
def adam_fraction_steps(theta, m1, m2, t, grads_w, stat_w, leaf, valid,
                        n_chunks: int = 16, ratio_power: float = 1.0):
    """Mini-batched per-leaf Adam on the bsdfSamplingFraction logit
    (reference: AdamOptimizer::step, guided_path.cpp:101-113; gradient
    optimizeBsdfSamplingFraction :676-700). ``grads_w`` rows are the
    per-sample (product, woPdf, bsdfPdf, dTreePdf) tuple; the θ-dependent
    part of the gradient is recomputed per chunk against the CURRENT θ,
    then segment-summed per leaf and stepped."""
    L = theta.shape[0]
    n = leaf.shape[0]
    csz = -(-n // n_chunks)
    pad = csz * n_chunks - n
    grads_w = jnp.pad(grads_w, ((0, pad), (0, 0)))
    stat_w = jnp.pad(stat_w, (0, pad))
    leaf_p = jnp.pad(leaf, (0, pad))
    valid_p = jnp.pad(valid, (0, pad), constant_values=False)

    def chunk(carry, ci):
        theta, m1, m2, t = carry
        sl = ci * csz
        g = jax.lax.dynamic_slice_in_dim(grads_w, sl, csz)
        sw = jax.lax.dynamic_slice_in_dim(stat_w, sl, csz)
        lf = jax.lax.dynamic_slice_in_dim(leaf_p, sl, csz)
        vd = jax.lax.dynamic_slice_in_dim(valid_p, sl, csz)
        product, wo_pdf, bsdf_pdf, g_pdf = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
        th = theta[lf]
        frac = jax.nn.sigmoid(th)
        mix = frac * bsdf_pdf + (1.0 - frac) * g_pdf
        ratio = jnp.power(
            jnp.where(mix > 0, product / jnp.maximum(mix, 1e-20), 0.0),
            ratio_power)
        dl_df = -ratio / jnp.maximum(wo_pdf, 1e-20) * (bsdf_pdf - g_pdf)
        df_dth = frac * (1.0 - frac)
        grad = 0.01 * th + dl_df * df_dth
        grad = jnp.where(vd & jnp.isfinite(grad), grad, 0.0)
        w = jnp.where(vd, sw, 0.0)
        gsum = jnp.zeros(L).at[lf].add(grad * w)
        wsum = jnp.zeros(L).at[lf].add(w)
        gbar = jnp.where(wsum > 0, gsum / jnp.maximum(wsum, 1e-20), 0.0)
        step = wsum > 0
        t = t + step.astype(jnp.int32)
        tf = jnp.maximum(t.astype(jnp.float32), 1.0)
        lr = 0.01 * jnp.sqrt(1.0 - 0.999 ** tf) / (1.0 - 0.9 ** tf)
        m1n = jnp.where(step, 0.9 * m1 + 0.1 * gbar, m1)
        m2n = jnp.where(step, 0.999 * m2 + 0.001 * gbar * gbar, m2)
        upd = lr * m1n / (jnp.sqrt(m2n) + 1e-8)
        theta = jnp.clip(jnp.where(step, theta - upd, theta), -20.0, 20.0)
        return (theta, m1n, m2n, t), None

    (theta, m1, m2, t), _ = jax.lax.scan(
        chunk, (theta, m1, m2, t), jnp.arange(n_chunks, dtype=jnp.int32))
    return theta, m1, m2, t


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("stochastic", "box"))
def _splat_jit(add_w, counts, pos, dirs, weight, valid, leaf, tables, key,
               stochastic: bool, box: bool):
    if stochastic:
        lo = tables["leaf_lo"][leaf]
        hi = tables["leaf_hi"][leaf]
        off = (jax.random.uniform(key, pos.shape) - 0.5) * (hi - lo)
        leaf = find_leaf(tables, pos + off)
    w = jnp.where(valid, weight, 0.0)
    ct, u = dir_to_uv(dirs)
    flat = add_w.reshape(-1)
    if box:
        fy = ct * RES - 0.5
        fx = u * RES - 0.5
        y0 = jnp.floor(fy)
        x0 = jnp.floor(fx)
        wy1 = fy - y0
        wx1 = fx - x0
        idxs = []
        vals = []
        for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
            for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
                yy = jnp.clip(y0.astype(jnp.int32) + dy, 0, RES - 1)
                xx = (x0.astype(jnp.int32) + dx) % RES  # φ wraps
                idxs.append(leaf * (RES * RES) + yy * RES + xx)
                vals.append(w * wy * wx)
        flat = flat.at[jnp.concatenate(idxs)].add(jnp.concatenate(vals))
    else:
        cell = dir_to_cell(dirs)
        flat = flat.at[leaf * (RES * RES) + cell].add(w)
    counts = counts.at[leaf].add(valid.astype(jnp.int32))
    return flat.reshape(add_w.shape), counts, leaf


@dataclass
class PPGConfig:
    max_leaves: int = 2048
    stree_threshold: int = 4000  # ppg.xml sTreeThreshold
    bsdf_fraction: float = 0.5
    bsdf_fraction_loss: str = "none"  # "none" | "kl" | "var"
    # (reference protocol ppg.xml:27 uses "none"; kl/var enable the
    # SGD-learned fraction, guided_path.cpp:1030-1076)
    rho: float = 0.01  # dTreeThreshold (1% subdivision rule)
    rays_per_wave: int = 1 << 16
    seed: int = 1234
    directional_filter: str = "box"  # ppg.xml directionalFilter
    spatial_filter: str = "stochastic"  # ppg.xml spatialFilter


class PPGTrainer:
    """Iterative budget-doubling training loop
    (reference: guided_path.cpp renderPass/resetSDTree iteration scheme)."""

    def __init__(self, scene, render_cfg, cfg: PPGConfig | None = None):
        self.scene = scene
        self.render_cfg = render_cfg
        self.cfg = cfg or PPGConfig()
        lo = np.asarray(scene.aabb_lo)
        hi = np.asarray(scene.aabb_hi)
        ext = hi - lo
        self.spatial_norm = float(ext.max())
        eps = 1e-5
        self.tree = STree(
            -eps * np.ones(3), ext / self.spatial_norm + eps,
            max_leaves=self.cfg.max_leaves,
            split_threshold=self.cfg.stree_threshold,
        )
        self.tree.split_to_depth(2)
        self.tables = self.tree.device_tables()
        self.hist = jnp.zeros((self.cfg.max_leaves, RES * RES))
        self.initialized = jnp.zeros((self.cfg.max_leaves,), dtype=bool)
        self.theta = jnp.zeros((self.cfg.max_leaves,))
        self.adam_m1 = jnp.zeros((self.cfg.max_leaves,))
        self.adam_m2 = jnp.zeros((self.cfg.max_leaves,))
        self.adam_t = jnp.zeros((self.cfg.max_leaves,), jnp.int32)
        self.iteration = 0
        self.stats: list[dict] = []

    def _project(self):
        eff, eff_row, total = project_adaptive(self.hist, self.cfg.rho)
        return (eff.reshape(-1, RES), eff_row, total)

    def _splat(self, add_w, counts, samples, key):
        """Training deposit: directional box filter (bilinear over the 4
        nearest finest cells) + spatial stochastic filter (position
        jittered by ±half leaf size before the leaf lookup). One jitted,
        buffer-donating call — the eager version copied the 32 MB
        histogram 4x per wave."""
        c = self.cfg
        return _splat_jit(
            add_w, counts, samples["pos"], samples["dir"],
            samples["weight"], samples["valid"], samples["leaf"],
            self.tables, key, c.spatial_filter == "stochastic",
            c.directional_filter == "box",
        )

    def run(self, total_spp: int, verbose: bool = False):
        """Budget-doubling iterations: 1, 2, 4, ... spp; the final (largest)
        iteration renders with the best-trained tree."""
        rc, c = self.render_cfg, self.cfg
        w, h = rc.width, rc.height
        n_pix = w * h
        wave = min(c.rays_per_wave, n_pix)
        n_waves = (n_pix + wave - 1) // wave
        pix_all = np.arange(n_waves * wave, dtype=np.int32) % n_pix
        learn = c.bsdf_fraction_loss != "none"
        ratio_power = 2.0 if c.bsdf_fraction_loss == "var" else 1.0
        iters = []
        spp_this = 1
        spp_done = 0
        while spp_done < total_spp:
            spp_this = min(spp_this, total_spp - spp_done)
            image = jnp.zeros((n_pix, 3))
            sqr = jnp.zeros((n_pix, 3))
            weight = jnp.zeros((n_pix,))
            add_w = jnp.zeros_like(self.hist)
            counts_dev = jnp.zeros(c.max_leaves, jnp.int32)
            eff2d, eff_row, total = self._project()
            t0 = time.time()
            for s in range(spp_this):
                for wv in range(n_waves):
                    kk = jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(jax.random.PRNGKey(c.seed), self.iteration), s
                        ), wv,
                    )
                    idx = jnp.asarray(pix_all[wv * wave : (wv + 1) * wave])
                    kj, kt, ks = jax.random.split(kk, 3)
                    u = jax.random.uniform(kj, (idx.shape[0], 2))
                    px = (idx % w).astype(jnp.float32) + u[:, 0]
                    py = (idx // w).astype(jnp.float32) + u[:, 1]
                    ro, rd = generate_rays(
                        self.scene, jnp.stack([px, py], -1), w, h, rc.fov_axis
                    )
                    li, samples = trace_wave_ppg(
                        self.scene, eff2d, eff_row, total, self.theta,
                        self.initialized, self.tables,
                        self.scene.aabb_lo, jnp.float32(1.0 / self.spatial_norm),
                        kt, ro, rd,
                        max_depth=rc.max_depth, rr_depth=rc.rr_depth,
                        bsdf_fraction=c.bsdf_fraction,
                        bsdf_types=rc.bsdf_types or None,
                        learn_fraction=learn,
                    )
                    li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
                    image, sqr, weight = film_mod.splat(image, sqr, weight, idx, li)
                    add_w, counts_dev, rec_leaf = self._splat(
                        add_w, counts_dev, samples, ks)
                    if learn:
                        gw = jnp.stack([
                            samples["product"], samples["wo_pdf"],
                            samples["bsdf_pdf"], samples["g_pdf"],
                        ], axis=-1)
                        # Keyed on the sample's OWN leaf, not the spatially
                        # jittered rec_leaf from _splat: the gradient's
                        # theta/g_pdf were evaluated at the original leaf,
                        # so crediting neighbor leaves mis-assigns the
                        # update (reference optimizes the fraction at the
                        # vertex's own dTree; ADVICE r4).
                        (self.theta, self.adam_m1, self.adam_m2,
                         self.adam_t) = adam_fraction_steps(
                            self.theta, self.adam_m1, self.adam_m2,
                            self.adam_t, gw, jnp.ones_like(samples["wo_pdf"]),
                            samples["leaf"],
                            samples["valid"] & (samples["product"] > 0),
                            ratio_power=ratio_power,
                        )
            # Train: REPLACE histograms with this iteration's radiance
            # estimates (the reference resets the DTree each iteration:
            # resetSDTree refines structure from old flux + clears it,
            # guided_path.cpp:1115-1116). ONE host fetch per iteration.
            counts = np.asarray(counts_dev).astype(np.float64)
            trained = jnp.asarray(counts) >= 64
            self.hist = jnp.where(trained[:, None], add_w, self.hist)
            self.initialized = self.initialized | trained
            # Spatial refine with the reference's growing threshold
            # (guided_path.cpp:1115): sqrt(2^iter·sppPerPass/4)·sTreeThreshold.
            # In the reference m_sppPerPass is the CONSTANT per-pass spp and
            # 2^m_iter the pass count; here spp_this ALREADY equals
            # 2^iter·base, so using both would double-count the doubling
            # (threshold ∝ 2^iter instead of 2^(iter/2) — by iteration 8
            # ~16x too high, starving the spatial refinement; ADVICE r4).
            self.tree.split_threshold = int(
                np.sqrt(spp_this / 4.0) * c.stree_threshold
            )
            copies = self.tree.refit(counts)
            if copies:
                self.tables = self.tree.device_tables()
                dst = jnp.asarray([d for d, _ in copies], jnp.int32)
                src = jnp.asarray([s for _, s in copies], jnp.int32)
                self.hist = self.hist.at[dst].set(self.hist[src] * 0.5)
                self.hist = self.hist.at[src].multiply(0.5)
                self.initialized = self.initialized.at[dst].set(self.initialized[src])
                self.theta = self.theta.at[dst].set(self.theta[src])
                self.adam_m1 = self.adam_m1.at[dst].set(self.adam_m1[src])
                self.adam_m2 = self.adam_m2.at[dst].set(self.adam_m2[src])
                self.adam_t = self.adam_t.at[dst].set(self.adam_t[src])
            iters.append({
                "image": np.asarray(image), "sqr": np.asarray(sqr),
                "weight": np.asarray(weight), "spp": spp_this,
            })
            self.stats.append({
                "iteration": self.iteration, "spp": spp_this,
                "seconds": time.time() - t0,
                "leaf_nodes_count": self.tree.n_leaves,
                "active": int(jnp.sum(self.initialized)),
            })
            if verbose:
                print(self.stats[-1])
            spp_done += spp_this
            spp_this *= 2
            self.iteration += 1
        # Inverse-variance combination over iterations. Variance of the
        # mean needs ≥2 samples; 1-spp iterations get a tiny fixed weight
        # so they cannot dominate (reference combines via
        # combine_renders.py with the same issue handled by sample counts).
        num = np.zeros((n_pix, 3))
        den = np.zeros((n_pix, 3))
        for it in iters:
            nw = np.maximum(it["weight"], 1.0)[:, None]
            mean = it["image"] / nw
            if it["spp"] < 2:
                iv = 1e-6
            else:
                var = np.maximum(it["sqr"] / nw - mean * mean, 0) / np.maximum(
                    nw - 1, 1
                )
                iv = 1.0 / max(var.mean(), 1e-12)
            num += iv * mean
            den += iv
        return (num / np.maximum(den, 1e-12)).reshape(h, w, 3), iters
