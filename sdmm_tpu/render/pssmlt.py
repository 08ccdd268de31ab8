"""Primary-sample-space Metropolis light transport (PSSMLT) and ERPT.

TPU-native re-design of the reference's MCMC integrators
(reference: mitsuba/src/integrators/pssmlt/{pssmlt,pssmlt_sampler}.cpp —
Kelemen-style PSS Metropolis; mitsuba/src/integrators/erpt/erpt.cpp —
energy redistribution). The reference runs a handful of long chains on
worker threads with a replayable random stream; on TPU the natural shape
is tens of thousands of SHORT independent chains advanced in lockstep by
one jitted scan, with film splatting as scatter-adds. The path measurement
is a deterministic function of a fixed-size primary sample vector (one
slot per potential random decision), so a chain mutation is just a vector
perturbation — no sampler replay machinery needed.

Veach-style MLT (reference: mitsuba/src/integrators/mlt/mlt.cpp) runs on
the same machinery with ``mutations="veach"``: its perturbation set is
restated in primary-sample space — lens perturbations move only the two
image-plane dims with an exponentially distributed screen radius
(mlt.cpp lensPerturbation), caustic/tail perturbations move only the
final bounce's decision dims (causticPerturbation), the bidirectional
mutation's role (ergodicity/global moves) is taken by large steps, and
multi-chain-style local moves by Kelemen small steps. Because the path
is a deterministic function of the PSS vector, the specular-chain
reprojection the reference does in path space happens implicitly (the
same lobe decisions replay at the perturbed pixel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdf as bsdf_mod
from ..core.frame import to_local, to_world
from ..scene import emitters
from ..scene.sensor import generate_rays
from . import intersect as isect
from .volpath import RAY_EPS, mi_weight, shading_frame


def pss_dims(max_depth: int) -> int:
    """2 pixel dims + 7 per bounce (3 NEE; 4 BSDF: container, lobe, 2D)."""
    return 2 + 7 * max_depth


@partial(jax.jit, static_argnames=("max_depth", "width", "height",
                                   "bsdf_types", "fov_axis", "nee"))
def eval_path(scene, u, width: int, height: int, max_depth: int = 6,
              bsdf_types: tuple | None = None, fov_axis: str = "x",
              nee: bool = True):
    """Deterministic path contribution for PSS vectors u [N, pss_dims].

    Returns dict(pix [N] int32, value [N,3], lum [N]). Mirrors the NEE
    path tracer (volpath.trace_wave) without Russian roulette — MCMC needs
    a fixed-dimension measurement, and the reference's PSSMLT also fixes
    the maximum depth per chain state.
    """
    n = u.shape[0]
    pdf_over_area = emitters.tri_pdf_over_area(scene)
    px = u[:, 0] * width
    py = u[:, 1] * height
    pix = (jnp.clip(py.astype(jnp.int32), 0, height - 1) * width
           + jnp.clip(px.astype(jnp.int32), 0, width - 1))
    ro, rd = generate_rays(scene, jnp.stack([px, py], -1), width, height,
                           fov_axis)

    li = jnp.zeros((n, 3))
    throughput = jnp.ones((n, 3))
    active = jnp.ones((n,), bool)
    prev_pdf = jnp.ones((n,))
    prev_delta = jnp.ones((n,), bool)

    for depth in range(max_depth):
        base = 2 + 7 * depth
        hit = isect.intersect(scene, ro, rd)
        it = isect.surface_interaction(scene, ro, rd, hit)

        le = emitters.eval_emitter(scene, it, -rd)
        if nee:
            pdf_nee = emitters.pdf_direct_hit(
                scene, pdf_over_area, hit["tri"], rd, hit["t"]
            )
            w_hit = jnp.where(prev_delta | (depth == 0), 1.0,
                              mi_weight(prev_pdf, pdf_nee))
        else:
            w_hit = jnp.ones(n)
        li = li + jnp.where(active[:, None],
                            throughput * le * w_hit[:, None], 0.0)
        li = li + jnp.where(
            (active & ~hit["valid"])[:, None],
            throughput * emitters.env_eval(scene, rd), 0.0,
        )
        active = active & hit["valid"]

        params = bsdf_mod.gather_params(scene, it["bsdf"], it["uv"],
                                        types=bsdf_types)
        s_ax, t_ax, n_ax = shading_frame(params, it["ns"], -rd)
        wi_local = to_local(s_ax, t_ax, n_ax, -rd)

        if nee:
            u1 = u[:, base + 0]
            u2 = u[:, base + 1:base + 3]
            ls = emitters.sample_direct(scene, it["p"], u1, u2)
            wo_l = to_local(s_ax, t_ax, n_ax, ls["d"])
            f, pdf_b = bsdf_mod.eval_pdf_full(params, wi_local, wo_l,
                                              types=bsdf_types)
            smooth = bsdf_mod.has_smooth(params)
            cand = active & ls["valid"] & smooth & (ls["pdf"] > 0.0)
            sh_o = it["p"] + it["ng"] * jnp.where(
                jnp.sum(it["ng"] * ls["d"], axis=-1) > 0, RAY_EPS, -RAY_EPS
            )[:, None]
            occ = isect.occluded(scene, sh_o, ls["d"],
                                 ls["dist"] * (1.0 - 1e-3))
            w = jnp.where(ls["delta"], 1.0, mi_weight(ls["pdf"], pdf_b))
            contrib = (throughput * f * ls["radiance"]
                       * (w / jnp.maximum(ls["pdf"], 1e-20))[:, None])
            li = li + jnp.where((cand & ~occ)[:, None], contrib, 0.0)

        bs = bsdf_mod.sample_full(
            params, wi_local, u[:, base + 3], u[:, base + 4],
            u[:, base + 5:base + 7], types=bsdf_types,
        )
        wo_world = to_world(s_ax, t_ax, n_ax, bs["wo"])
        active = active & jnp.any(bs["weight"] > 0.0, axis=-1)
        throughput = throughput * bs["weight"]
        ro = it["p"] + it["ng"] * jnp.where(
            jnp.sum(it["ng"] * wo_world, axis=-1) > 0, RAY_EPS, -RAY_EPS
        )[:, None]
        rd = wo_world
        prev_pdf = bs["pdf"]
        prev_delta = bs["delta"]

    li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
    lum = jnp.sum(li * jnp.array([0.212671, 0.715160, 0.072169]), axis=-1)
    return {"pix": pix, "value": li, "lum": lum}


def _lens_step(key, u, width, height, r1=0.1, r2_frac=0.05):
    """Veach lens perturbation in PSS: move only the image-plane dims by
    an exponentially distributed pixel radius (reference: mlt.cpp)."""
    k1, k2 = jax.random.split(key)
    r2 = r2_frac * width
    r = r2 * jnp.exp(-jnp.log(r2 / r1) * jax.random.uniform(k1, u.shape[:1]))
    phi = 2.0 * jnp.pi * jax.random.uniform(k2, u.shape[:1])
    du = jnp.stack([r * jnp.cos(phi) / width, r * jnp.sin(phi) / height], -1)
    v = u.at[:, 0:2].add(du)
    return v - jnp.floor(v)


def _tail_step(key, u, n_bounce_dims=7, s1=1.0 / 256.0, s2=1.0 / 16.0):
    """Caustic-style perturbation: mutate only the last bounce's decision
    dims, replaying everything earlier (reference: mlt.cpp
    causticPerturbation restated in PSS)."""
    tail = _small_step(key, u[:, -n_bounce_dims:], s1, s2)
    return u.at[:, -n_bounce_dims:].set(tail)


def _small_step(key, u, s1=1.0 / 1024.0, s2=1.0 / 64.0):
    """Kelemen exponential perturbation with wrap-around
    (reference: pssmlt_sampler.cpp mutate())."""
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, u.shape)
    sign = jnp.where(jax.random.uniform(k2, u.shape) < 0.5, -1.0, 1.0)
    mag = s2 * jnp.exp(-jnp.log(s2 / s1) * r)
    v = u + sign * mag
    return v - jnp.floor(v)


def render_pssmlt(scene, cfg, spp: int = 16, seed: int = 1234,
                  n_chains: int = 1 << 14, p_large: float = 0.3,
                  n_bootstrap: int = 1 << 16, max_depth: int | None = None,
                  mutations: str = "kelemen"):
    """Kelemen PSSMLT with expected-value splatting.

    ``spp`` sets the mutation budget to spp·n_pixels. The normalization
    b = E[f] comes from the bootstrap pass, whose samples also seed the
    chains by resampling ∝ f (reference: pssmlt.cpp computes b in a
    preprocessing pass the same way).
    """
    w, h = cfg.width, cfg.height
    n_pix = w * h
    depth = max_depth or min(cfg.max_depth, 6)
    dims = pss_dims(depth)
    types = cfg.bsdf_types or None
    key = jax.random.PRNGKey(seed)

    # Bootstrap: normalization constant + chain seeds.
    kb, kr, kc = jax.random.split(key, 3)
    u0 = jax.random.uniform(kb, (n_bootstrap, dims))
    boot = eval_path(scene, u0, w, h, max_depth=depth, bsdf_types=types,
                     fov_axis=cfg.fov_axis)
    b = float(jnp.mean(boot["lum"]))
    if b <= 0:
        return {"image": np.zeros((h, w, 3)), "b": 0.0}
    probs = np.asarray(boot["lum"], dtype=np.float64)
    probs = probs / probs.sum()
    idx = np.random.default_rng(seed).choice(
        n_bootstrap, size=n_chains, p=probs
    )
    u_cur = u0[jnp.asarray(idx)]
    cur = eval_path(scene, u_cur, w, h, max_depth=depth, bsdf_types=types,
                    fov_axis=cfg.fov_axis)

    total_mutations = spp * n_pix
    n_steps = max(1, total_mutations // n_chains)

    @jax.jit
    def chain_scan(key, u_cur, cur_pix, cur_val, cur_lum):
        film = jnp.zeros((n_pix, 3))

        def step(carry, k):
            film, u_cur, cur_pix, cur_val, cur_lum = carry
            k1, k2, k3 = jax.random.split(k, 3)
            u_large = jax.random.uniform(k2, (n_chains, dims))
            if mutations == "veach":
                # Mutation mixture (all proposals symmetric): 30% large
                # (bidirectional analog), 30% lens, 20% caustic/tail, 20%
                # Kelemen small.
                sel = jax.random.uniform(k1, (n_chains,))
                u_lens = _lens_step(jax.random.fold_in(k3, 1), u_cur, w, h)
                u_tail = _tail_step(jax.random.fold_in(k3, 2), u_cur)
                u_small = _small_step(jax.random.fold_in(k3, 3), u_cur)
                u_prop = jnp.where(
                    (sel < 0.3)[:, None], u_large,
                    jnp.where((sel < 0.6)[:, None], u_lens,
                              jnp.where((sel < 0.8)[:, None], u_tail,
                                        u_small)))
            else:
                large = jax.random.uniform(k1, (n_chains,)) < p_large
                u_small = _small_step(k3, u_cur)
                u_prop = jnp.where(large[:, None], u_large, u_small)
            prop = eval_path(scene, u_prop, w, h, max_depth=depth,
                             bsdf_types=types, fov_axis=cfg.fov_axis)
            a = jnp.clip(prop["lum"] / jnp.maximum(cur_lum, 1e-12), 0.0, 1.0)
            a = jnp.where(cur_lum <= 0, 1.0, a)
            # Expected-value splats: current with 1-a, proposal with a
            # (each normalized by its own f).
            w_cur = ((1.0 - a) / jnp.maximum(cur_lum, 1e-12))[:, None] * cur_val
            w_prop = (a / jnp.maximum(prop["lum"], 1e-12))[:, None] * prop["value"]
            film = film.at[cur_pix].add(jnp.where(
                (cur_lum > 0)[:, None], w_cur, 0.0))
            film = film.at[prop["pix"]].add(jnp.where(
                (prop["lum"] > 0)[:, None], w_prop, 0.0))
            accept = jax.random.uniform(jax.random.fold_in(k, 7),
                                        (n_chains,)) < a
            u_cur = jnp.where(accept[:, None], u_prop, u_cur)
            cur_pix = jnp.where(accept, prop["pix"], cur_pix)
            cur_val = jnp.where(accept[:, None], prop["value"], cur_val)
            cur_lum = jnp.where(accept, prop["lum"], cur_lum)
            return (film, u_cur, cur_pix, cur_val, cur_lum), jnp.mean(a)

        keys = jax.random.split(key, n_steps)
        (film, *_), acc = jax.lax.scan(
            step, (film, u_cur, cur_pix, cur_val, cur_lum), keys
        )
        return film, jnp.mean(acc)

    film, acc_rate = chain_scan(kc, u_cur, cur["pix"], cur["value"],
                                cur["lum"])
    # I_j = n_pix · b · E[1_j · C/f]  (pixel convention: mean radiance).
    img = np.asarray(film) * (n_pix * b / (n_steps * n_chains))
    return {
        "image": img.reshape(h, w, 3),
        "b": b,
        "acceptance": float(acc_rate),
    }


def render_erpt(scene, cfg, spp: int = 8, seed: int = 1234,
                chains_per_seed_lum: float = 1.0, chain_length: int = 32,
                n_seeds: int = 1 << 14, max_depth: int | None = None):
    """Energy redistribution path tracing (reference: erpt/erpt.cpp).

    Path-traced seeds spawn equal-energy Metropolis chains of small-step
    PSS mutations; each chain deposit is e = b/(chains·len) per mutation.
    Implemented as stochastic chain spawning: a seed with luminance f
    starts one chain with probability f/(e·len··) — in lockstep waves.
    """
    w, h = cfg.width, cfg.height
    n_pix = w * h
    depth = max_depth or min(cfg.max_depth, 6)
    dims = pss_dims(depth)
    types = cfg.bsdf_types or None
    key = jax.random.PRNGKey(seed)

    k_seed, k_spawn, k_chain = jax.random.split(key, 3)
    u0 = jax.random.uniform(k_seed, (n_seeds, dims))
    seeds = eval_path(scene, u0, w, h, max_depth=depth, bsdf_types=types,
                      fov_axis=cfg.fov_axis)
    b = float(jnp.mean(seeds["lum"]))
    if b <= 0:
        return {"image": np.zeros((h, w, 3)), "b": 0.0}
    # Energy quantum per chain (Cline et al.): e_d = b·len / mean chains.
    e_chain = b * chains_per_seed_lum
    # Spawn chains: expected count f/e_chain per seed; cap at 1 with
    # probability-weighted energy (stochastic rounding keeps it unbiased).
    ratio = seeds["lum"] / e_chain
    spawn = jax.random.uniform(k_spawn, (n_seeds,)) < jnp.minimum(ratio, 1.0)
    # Chains started at high-energy seeds may carry ratio>1 energy.
    chain_e = jnp.where(spawn, jnp.maximum(ratio, 1.0) * e_chain, 0.0)

    @jax.jit
    def run_chains(key, u_cur, cur_pix, cur_val, cur_lum, chain_e):
        film = jnp.zeros((n_pix, 3))
        deposit = (chain_e / chain_length)[:, None]

        def step(carry, k):
            film, u_cur, cur_pix, cur_val, cur_lum = carry
            u_prop = _small_step(k, u_cur)
            prop = eval_path(scene, u_prop, w, h, max_depth=depth,
                             bsdf_types=types, fov_axis=cfg.fov_axis)
            a = jnp.clip(prop["lum"] / jnp.maximum(cur_lum, 1e-12), 0.0, 1.0)
            w_cur = ((1.0 - a) / jnp.maximum(cur_lum, 1e-12))[:, None] * cur_val
            w_prop = (a / jnp.maximum(prop["lum"], 1e-12))[:, None] * prop["value"]
            film = film.at[cur_pix].add(
                jnp.where((cur_lum > 0)[:, None], w_cur * deposit, 0.0))
            film = film.at[prop["pix"]].add(
                jnp.where((prop["lum"] > 0)[:, None], w_prop * deposit, 0.0))
            accept = jax.random.uniform(jax.random.fold_in(k, 7),
                                        (u_cur.shape[0],)) < a
            u_cur = jnp.where(accept[:, None], u_prop, u_cur)
            cur_pix = jnp.where(accept, prop["pix"], cur_pix)
            cur_val = jnp.where(accept[:, None], prop["value"], cur_val)
            cur_lum = jnp.where(accept, prop["lum"], cur_lum)
            return (film, u_cur, cur_pix, cur_val, cur_lum), None

        keys = jax.random.split(key, chain_length)
        (film, *_), _ = jax.lax.scan(
            step, (film, u_cur, cur_pix, cur_val, cur_lum), keys
        )
        return film

    film = run_chains(k_chain, u0, seeds["pix"], seeds["value"],
                      seeds["lum"], chain_e)
    img = np.asarray(film) * (n_pix / n_seeds)
    return {"image": img.reshape(h, w, 3), "b": b}
