"""Render driver: tiles waves of camera rays through an integrator.

Replaces the reference's BlockedRenderProcess + per-core WorkProcessor
orchestration (reference: mitsuba/include/mitsuba/render/renderproc.h:38,
mitsuba/src/librender/renderproc.cpp): instead of spiral-ordered tiles pulled
by worker threads, the image is a flat pixel array split into fixed-size ray
waves executed as jitted device programs, with film accumulation on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.sensor import generate_rays
from . import film as film_mod
from .volpath import trace_wave


def render(
    scene,
    cfg,
    spp: int = 16,
    seed: int = 1234,
    rays_per_wave: int = 1 << 16,
    nee: bool = True,
    trace_fn=None,
    sampler: str = "independent",
    rfilter: str = "box",
):
    """Render an image; returns dict(image [H,W,3], sqr, weight).

    sampler: independent | stratified | halton (camera-jitter dimension;
    reference sampler plugins, SURVEY.md C19). rfilter: box | gaussian
    (reference rfilter plugins, SURVEY.md C23).
    """
    from ..core.sampler import camera_jitter

    if cfg.has_sss and not cfg.sss_baked:
        from .subsurface import bake_subsurface

        scene = bake_subsurface(scene, cfg, seed=seed)

    w, h = cfg.width, cfg.height
    n_pix = w * h
    image = jnp.zeros((n_pix, 3))
    sqr = jnp.zeros((n_pix, 3))
    weight = jnp.zeros((n_pix,))
    trace = trace_fn or (
        lambda scene, key, ro, rd: trace_wave(
            scene, key, ro, rd, max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            nee=nee, bsdf_types=cfg.bsdf_types or None,
            has_medium=cfg.has_medium, has_hetero=cfg.has_hetero,
            has_bump=cfg.has_bump, has_sss=cfg.has_sss,
        )
    )

    wave = min(rays_per_wave, n_pix)
    # Pad pixel count to a whole number of waves.
    n_waves = (n_pix + wave - 1) // wave
    pix = np.arange(n_waves * wave, dtype=np.int32) % n_pix

    @jax.jit
    def run_wave(image, sqr, weight, key, pixel_idx, s_idx):
        kj, kt = jax.random.split(key)
        sample_idx = jnp.broadcast_to(s_idx, pixel_idx.shape).astype(jnp.int32)
        u = camera_jitter(sampler, jax.random.fold_in(jax.random.PRNGKey(seed), 77),
                          pixel_idx, sample_idx, spp) if sampler != "independent" \
            else jax.random.uniform(kj, (pixel_idx.shape[0], 2))
        px = (pixel_idx % w).astype(jnp.float32) + u[:, 0]
        py = (pixel_idx // w).astype(jnp.float32) + u[:, 1]
        ro, rd = generate_rays(scene, jnp.stack([px, py], axis=-1), w, h, cfg.fov_axis)
        li = trace(scene, kt, ro, rd)
        li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
        if rfilter == "gaussian":
            return film_mod.splat_gaussian(
                image, sqr, weight, pixel_idx, li, px, py, w, h
            )
        if rfilter != "box":
            from .rfilters import splat_filtered

            return splat_filtered(
                image, sqr, weight, pixel_idx, li, px, py, w, h, rfilter
            )
        return film_mod.splat(image, sqr, weight, pixel_idx, li)

    key = jax.random.PRNGKey(seed)
    for s in range(spp):
        for wv in range(n_waves):
            k = jax.random.fold_in(jax.random.fold_in(key, s), wv)
            idx = jnp.asarray(pix[wv * wave : (wv + 1) * wave])
            image, sqr, weight = run_wave(
                image, sqr, weight, k, idx, jnp.int32(s)
            )
    return {
        "image": film_mod.develop(image, weight).reshape(h, w, 3),
        "sqr": np.asarray(sqr).reshape(h, w, 3),
        "weight": np.asarray(weight).reshape(h, w),
        "raw": np.asarray(image).reshape(h, w, 3),
    }
