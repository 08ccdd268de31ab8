"""Photon mapping: photonmapper, PPM, SPPM — TPU-native.

Re-design of the reference's photon-map integrators
(reference: mitsuba/src/integrators/photonmapper/{photonmapper,ppm,sppm}.cpp,
mitsuba/src/librender/photonmap.cpp). The kd-tree photon map becomes a
sorted uniform grid: photons are keyed by cell id, sorted once
(`jnp.argsort`), and range queries are two `searchsorted` calls per
neighbor cell — the lock-free scatter/gather dual of the reference's
balanced kd-tree, with no pointer chasing on device.

Estimator split (as the reference's photonmapper with direct sampling on):
emitted + NEE direct at the gather point come from the camera pass; the
photon density estimate covers indirect light only (photons deposited
from the second light-path vertex onward).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdf as bsdf_mod
from ..core.frame import to_local, to_world
from ..scene import emitters
from . import intersect as isect
from .ptracer import sample_emission
from .volpath import RAY_EPS, shading_frame


@partial(jax.jit, static_argnames=("n_paths", "max_depth", "bsdf_types"))
def trace_photons(scene, key, n_paths: int, max_depth: int = 8,
                  bsdf_types: tuple | None = None):
    """Light random walk depositing photons at smooth-surface vertices.

    Returns dict of [n_paths*max_depth] photon arrays: p, wi (unit, points
    back along the photon's incoming segment), power [.,3], valid. The
    FIRST vertex (direct light) is excluded — direct illumination is
    estimated by NEE in the camera pass (reference: photonmapper.cpp
    separates direct sampling from the global map).
    """
    k_e, k_w = jax.random.split(key)
    em = sample_emission(scene, k_e, n_paths)

    def body(carry, inp):
        ro, rd, beta, active = carry
        depth, k = inp
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        active = active & hit["valid"]
        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        smooth = bsdf_mod.has_smooth(params)
        photon = {
            "p": it["p"],
            "wi": -rd,
            "n": it["ns"],
            "power": beta,
            "valid": active & smooth & (depth >= 1),
        }
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)
        u0 = jax.random.uniform(jax.random.fold_in(k, 2), (n_paths,))
        u1 = jax.random.uniform(k, (n_paths,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n_paths, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1, u2,
                                  types=bsdf_types)
        rd_n = to_world(s_ax, t_ax, n_ax, bs["wo"])
        beta = beta * bs["weight"]
        active = active & jnp.any(bs["weight"] > 0.0, axis=-1)
        # RR keeps photon powers bounded (reference: photonmap emission RR).
        k_rr = jax.random.fold_in(k, 3)
        q = jnp.clip(jnp.max(bs["weight"], axis=-1), 0.05, 0.95)
        do_rr = depth >= 3
        kill = do_rr & (jax.random.uniform(k_rr, (n_paths,)) >= q)
        active = active & ~kill
        beta = jnp.where((do_rr & active)[:, None],
                         beta / jnp.maximum(q, 1e-6)[:, None], beta)
        ro_n = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * rd_n, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        return (ro_n, rd_n, beta, active), photon

    keys = jax.random.split(k_w, max_depth)
    init = (em["p"] + em["n"] * RAY_EPS, em["d"], em["beta"], em["valid"])
    _, ph = jax.lax.scan(body, init,
                         (jnp.arange(max_depth, dtype=jnp.int32), keys))
    # [D, N, ...] -> [D*N, ...]
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in ph.items()}


def build_photon_grid(scene, photons, radius: float, key=None):
    """Sort photons by uniform-grid cell id (cell size = gather radius).

    Returns dict(order, cell_ids_sorted, dims, lo, inv_cell). Queries use
    searchsorted over cell_ids_sorted — the device-friendly equivalent of
    the reference's kd-tree rangeSearch (photonmap.cpp estimateRadiance).

    Within-cell order is randomized (permute, then stable sort): the
    gather's fixed per-cell budget scans a prefix of each cell, and the
    deposition order is depth-major — a non-random prefix would bias the
    budget-overflow correction toward high-power low-depth photons.
    """
    lo = scene.aabb_lo - radius
    hi = scene.aabb_hi + radius
    inv_cell = 1.0 / radius
    dims = jnp.maximum(jnp.ceil((hi - lo) * inv_cell).astype(jnp.int32), 1)
    cid = cell_id(photons["p"], lo, inv_cell, dims)
    # Invalid photons get a sentinel id past every real cell.
    sentinel = dims[0] * dims[1] * dims[2] + 1
    cid = jnp.where(photons["valid"], cid, sentinel)
    if key is None:
        key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, cid.shape[0])
    order = perm[jnp.argsort(cid[perm], stable=True)]
    return {
        "order": order, "cids": cid[order], "dims": dims,
        "lo": lo, "inv_cell": inv_cell,
    }


def cell_id(p, lo, inv_cell, dims):
    ijk = jnp.clip(((p - lo) * inv_cell).astype(jnp.int32), 0,
                   dims[None] - 1 if p.ndim > 1 else dims - 1)
    return (ijk[..., 0]
            + dims[0] * (ijk[..., 1] + dims[1] * ijk[..., 2]))


def gather_radiance(scene, photons, grid, p, wi_local, frame, params,
                    r2, bsdf_types: tuple | None = None, k_per_cell: int = 16):
    """Photon density estimate at points p [N,3]: Σ f·Φ / (π r²).

    Scans the 27 neighbor cells with a fixed per-cell photon budget
    (k_per_cell); overflow photons in denser cells are dropped, a bias the
    radius/budget choice keeps small (the reference's kd-tree pays the
    equivalent cost in truncated k-NN).
    """
    s_ax, t_ax, n_ax = frame
    n = p.shape[0]
    dims = grid["dims"]
    lo = grid["lo"]
    inv_cell = grid["inv_cell"]
    ijk = jnp.clip(((p - lo) * inv_cell).astype(jnp.int32), 0, dims[None] - 1)
    acc = jnp.zeros((n, 3))

    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                q = ijk + jnp.array([dx, dy, dz])
                in_grid = jnp.all((q >= 0) & (q < dims[None]), axis=-1)
                qc = jnp.clip(q, 0, dims[None] - 1)
                cid = qc[:, 0] + dims[0] * (qc[:, 1] + dims[1] * qc[:, 2])
                start = jnp.searchsorted(grid["cids"], cid)
                end = jnp.searchsorted(grid["cids"], cid, side="right")
                count = end - start

                def scan_k(cell_acc, k):
                    idx = grid["order"][
                        jnp.clip(start + k, 0, grid["order"].shape[0] - 1)
                    ]
                    ok = in_grid & (k < count)
                    dp = photons["p"][idx] - p
                    d2 = jnp.sum(dp * dp, axis=-1)
                    ok = ok & photons["valid"][idx] & (d2 < r2)
                    # Reject photons on disagreeing surfaces (leak across
                    # perpendicular walls; the reference's kd-tree gather
                    # applies the same normal filter, photonmap.cpp).
                    ok = ok & (jnp.sum(photons["n"][idx] * n_ax, axis=-1)
                               > 0.7)
                    wi_ph = to_local(s_ax, t_ax, n_ax, photons["wi"][idx])
                    f, _ = bsdf_mod.eval_pdf_full(
                        params, wi_local, wi_ph, types=bsdf_types
                    )
                    # eval returns f·cos(wi_ph); the density estimate wants
                    # the cosine-free f (the photon power already carries
                    # the arrival geometry), so divide the cosine back out.
                    cos_ph = jnp.maximum(jnp.abs(wi_ph[..., 2]), 1e-4)
                    contrib = f / cos_ph[:, None] * photons["power"][idx]
                    return cell_acc + jnp.where(ok[:, None], contrib, 0.0), None

                cell_acc, _ = jax.lax.scan(scan_k, jnp.zeros_like(acc),
                                           jnp.arange(k_per_cell))
                # Budget correction: the K scanned photons are an unbiased
                # subset of the cell → rescale by count/min(count, K).
                corr = count.astype(jnp.float32) / jnp.maximum(
                    jnp.minimum(count, k_per_cell).astype(jnp.float32), 1.0
                )
                acc = acc + cell_acc * corr[:, None]
    return acc / (jnp.pi * r2[:, None] if r2.ndim else jnp.pi * r2)


@partial(jax.jit, static_argnames=("bsdf_types", "k_per_cell", "spec_depth"))
def camera_gather(scene, key, ro, rd, photons, grid, r2,
                  bsdf_types: tuple | None = None, k_per_cell: int = 16,
                  spec_depth: int = 4):
    """Camera pass: walk through delta surfaces, then Le + NEE direct +
    photon gather at the first smooth surface. Returns (li, flux, m_count)
    where flux/m_count feed the SPPM statistics (flux EXCLUDES the 1/πr²
    normalization; li includes everything for the plain photonmapper).
    """
    n = ro.shape[0]
    li = jnp.zeros((n, 3))
    flux = jnp.zeros((n, 3))
    m_cnt = jnp.zeros((n,))
    beta = jnp.ones((n, 3))
    active = jnp.ones((n,), bool)
    prev_delta = jnp.ones((n,), bool)  # camera rays count as delta

    for depth in range(spec_depth):
        k = jax.random.fold_in(key, depth)
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)
        le = emitters.eval_emitter(scene, it, -rd)
        # Only on delta chains (NEE covers the rest).
        li = li + jnp.where((active & prev_delta & hit["valid"])[:, None],
                            beta * le, 0.0)
        li = li + jnp.where((active & prev_delta & ~hit["valid"])[:, None],
                            beta * emitters.env_eval(scene, rd), 0.0)
        active = active & hit["valid"]

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        smooth = bsdf_mod.has_smooth(params)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)

        at_gather = active & smooth
        # NEE direct at the gather point.
        u1 = jax.random.uniform(k, (n,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
        ls = emitters.sample_direct(scene, it["p"], u1, u2)
        wo_l = to_local(s_ax, t_ax, n_ax, ls["d"])
        f_d, _ = bsdf_mod.eval_pdf_full(params, wi_local, wo_l,
                                        types=bsdf_types)
        sh_o = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * ls["d"], axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        occ = isect.occluded(scene, sh_o, ls["d"], ls["dist"] * (1.0 - 1e-3))
        cand = at_gather & ls["valid"] & (ls["pdf"] > 0.0) & ~occ
        li = li + jnp.where(
            cand[:, None],
            beta * f_d * ls["radiance"] / jnp.maximum(ls["pdf"], 1e-20)[:, None],
            0.0,
        )

        # Photon gather (indirect).
        r2v = jnp.broadcast_to(r2, (n,))
        ind = gather_radiance(scene, photons, grid, it["p"], wi_local,
                              (s_ax, t_ax, n_ax), params, r2v,
                              bsdf_types=bsdf_types, k_per_cell=k_per_cell)
        li = li + jnp.where(at_gather[:, None], beta * ind, 0.0)
        flux = flux + jnp.where(at_gather[:, None],
                                beta * ind * (jnp.pi * r2v)[:, None], 0.0)
        m_cnt = m_cnt + jnp.where(at_gather, 1.0, 0.0)

        # Continue only through delta surfaces.
        u0 = jax.random.uniform(jax.random.fold_in(k, 4), (n,))
        u1b = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
        u2b = jax.random.uniform(jax.random.fold_in(k, 3), (n, 2))
        bs = bsdf_mod.sample_full(params, wi_local, u0, u1b, u2b,
                                  types=bsdf_types)
        active = active & ~smooth & jnp.any(bs["weight"] > 0.0, axis=-1)
        beta = beta * jnp.where(active[:, None], bs["weight"], 1.0)
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        ro = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * wo_world, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        rd = wo_world
        prev_delta = jnp.ones((n,), bool)
    return li, flux, m_cnt


def render_photonmap(scene, cfg, spp: int = 4, seed: int = 1234,
                     n_photon_paths: int = 1 << 17, radius: float | None = None,
                     photon_depth: int = 8):
    """Plain photon mapper: one global map, fixed gather radius
    (reference: photonmapper.cpp with globalPhotons + direct sampling)."""
    from .renderer import render

    if radius is None:
        radius = 0.02 * float(
            np.linalg.norm(np.asarray(scene.aabb_hi - scene.aabb_lo))
        )
    photons = trace_photons(
        scene, jax.random.PRNGKey(seed ^ 0x9E37), n_photon_paths,
        max_depth=photon_depth, bsdf_types=cfg.bsdf_types or None,
    )
    # Normalize power by emitted path count.
    photons = dict(photons)
    photons["power"] = photons["power"] / n_photon_paths
    grid = build_photon_grid(scene, photons, radius)
    r2 = jnp.float32(radius * radius)

    def trace_fn(scene, key, ro, rd):
        li, _, _ = camera_gather(
            scene, key, ro, rd, photons, grid, r2,
            bsdf_types=cfg.bsdf_types or None,
        )
        return li

    return render(scene, cfg, spp=spp, seed=seed, trace_fn=trace_fn)


def render_sppm(scene, cfg, iterations: int = 8, seed: int = 1234,
                photon_paths_per_iter: int = 1 << 16,
                initial_radius: float | None = None, alpha: float = 0.7,
                photon_depth: int = 8):
    """Stochastic progressive photon mapping (reference: sppm.cpp).

    Per-pixel statistics (r², N, τ) with the original SPPM update:
    r'² = r²(N+αM)/(N+M), τ' = (τ+Φ)·r'²/r². Camera gather points are
    re-jittered every iteration; direct+emitted are averaged separately.
    """
    from ..scene.sensor import generate_rays

    w, h = cfg.width, cfg.height
    n_pix = w * h
    if initial_radius is None:
        initial_radius = 0.03 * float(
            np.linalg.norm(np.asarray(scene.aabb_hi - scene.aabb_lo))
        )
    r2 = jnp.full((n_pix,), initial_radius * initial_radius)
    n_acc = jnp.zeros((n_pix,))
    tau = jnp.zeros((n_pix, 3))
    direct = jnp.zeros((n_pix, 3))
    key = jax.random.PRNGKey(seed)

    pix = jnp.arange(n_pix, dtype=jnp.int32)

    @jax.jit
    def one_iter(key, r2, n_acc, tau, direct):
        k_c, k_p, k_g = jax.random.split(key, 3)
        u = jax.random.uniform(k_c, (n_pix, 2))
        px = (pix % w).astype(jnp.float32) + u[:, 0]
        py = (pix // w).astype(jnp.float32) + u[:, 1]
        ro, rd = generate_rays(scene, jnp.stack([px, py], -1), w, h,
                               cfg.fov_axis)
        photons = trace_photons(
            scene, k_p, photon_paths_per_iter, max_depth=photon_depth,
            bsdf_types=cfg.bsdf_types or None,
        )
        photons = dict(photons)
        photons["power"] = photons["power"] / photon_paths_per_iter
        # Grid cell size must cover the largest current radius.
        grid = build_photon_grid(scene, photons, float(initial_radius))
        li, flux, m = camera_gather(
            scene, k_g, ro, rd, photons, grid, r2,
            bsdf_types=cfg.bsdf_types or None,
        )
        # li includes the gather with current r2 — direct part is
        # li - flux/(pi r2).
        d_part = li - flux / (jnp.pi * r2)[:, None]
        direct = direct + jnp.nan_to_num(d_part)
        m = jnp.minimum(m, 1.0)
        n_new = n_acc + alpha * m
        shrink = jnp.where(m > 0, (n_acc + alpha * m)
                           / jnp.maximum(n_acc + m, 1e-6), 1.0)
        r2_new = r2 * shrink
        tau_new = (tau + jnp.nan_to_num(flux)) * shrink[:, None]
        return r2_new, n_new, tau_new, direct

    for i in range(iterations):
        r2, n_acc, tau, direct = one_iter(
            jax.random.fold_in(key, i), r2, n_acc, tau, direct
        )
    n_emitted = iterations  # photon normalization already per-path
    img = (direct / iterations
           + tau / (jnp.pi * r2)[:, None] / n_emitted)
    return {
        "image": np.asarray(img).reshape(h, w, 3),
        "r2": np.asarray(r2).reshape(h, w),
    }
