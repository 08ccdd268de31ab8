"""Multi-device execution: rays sharded over a device mesh.

TPU-native replacement for the reference's distributed rendering stack
(reference: mitsuba/src/libcore/sched_remote.cpp RemoteWorker/StreamBackend,
mitsuba/src/mitsuba/mtssrv.cpp): instead of serializing work units over
TCP/SSH streams, the ray wave is sharded over a ``jax.sharding.Mesh`` with
``shard_map``; film accumulation and EM sufficient statistics are combined
with ``psum`` over ICI/DCN. This also removes the reference's single-host
limitation for the guiding cache (SURVEY.md §2.4: the raw ``Accelerator*``
pointer) — the mixture state is replicated and updated collectively.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..guiding import em as em_mod
from ..guiding import mixture as mix
from ..render import film as film_mod
from ..render.guided import GuideState, trace_wave_guided
from ..scene.sensor import generate_rays


def make_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def build_train_step(scene, render_cfg, mesh: Mesh, trainer_cfg=None,
                     axis_name: str = "rays"):
    """Returns a jitted distributed training step.

    step(sdmm, em_state, initialized, tables, pixel_idx [N], key)
      → (new_sdmm, new_em, film_partials [n_pix, 3], counts [L])

    Rays are sharded over ``axis_name``; mixture state is replicated. The
    film and EM statistics ride a ``psum`` so every device ends with the
    same updated guiding cache (all-reduced sufficient statistics — the
    design obligation from SURVEY.md §2.4).
    """
    from ..guiding.trainer import TrainerConfig

    tc = trainer_cfg or TrainerConfig()
    w, h = render_cfg.width, render_cfg.height
    n_pix = w * h
    n_dev = mesh.devices.size

    def shard_body(sdmm, em_state, initialized, tables, aabb_lo, inv_norm,
                   pixel_idx, key):
        # Per-shard key: fold in the device index.
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        prep = mix.prepare(sdmm)
        gs = GuideState(
            sdmm=sdmm, prep=prep, initialized=initialized, tables=tables,
            aabb_lo=aabb_lo, inv_norm=inv_norm,
        )
        kj, kt = jax.random.split(key)
        u = jax.random.uniform(kj, (pixel_idx.shape[0], 2))
        px = (pixel_idx % w).astype(jnp.float32) + u[:, 0]
        py = (pixel_idx // w).astype(jnp.float32) + u[:, 1]
        ro, rd = generate_rays(
            scene, jnp.stack([px, py], axis=-1), w, h, render_cfg.fov_axis
        )
        li, samples = trace_wave_guided(
            scene, gs, kt, ro, rd,
            max_depth=render_cfg.max_depth, rr_depth=render_cfg.rr_depth,
            bsdf_fraction=tc.bsdf_fraction,
            bsdf_types=render_cfg.bsdf_types or None,
            has_medium=render_cfg.has_medium,
            has_hetero=render_cfg.has_hetero,
        )
        li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
        image = jnp.zeros((n_pix, 3)).at[pixel_idx].add(li)
        image = jax.lax.psum(image, axis_name)

        # EM: local E-step stats, all-reduced, replicated M-step.
        from ..guiding.stree import find_leaf

        leaf = find_leaf(tables, samples["pos"])
        sw, sm, sc, ws, cnt = em_mod.e_step(
            sdmm, prep, samples["pos"], samples["dir"], samples["weight"],
            leaf, tc.max_leaves, tc.em.batch_size,
        )
        sw = jax.lax.psum(sw, axis_name)
        sm = jax.lax.psum(sm, axis_name)
        sc = jax.lax.psum(sc, axis_name)
        ws = jax.lax.psum(ws, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)

        active = (cnt >= 8) & (sw.sum(-1) > 0)
        new_sdmm, new_em = em_mod.m_step(
            sdmm, prep, em_state, sw, sm, sc, ws, active, tc.em
        )
        new_init = initialized | active
        return new_sdmm, new_em, new_init, image, cnt

    rep = P()
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, P(axis_name), rep),
        out_specs=(rep, rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_render_step(scene, render_cfg, mesh: Mesh, axis_name: str = "rays"):
    """Distributed plain rendering step (no training): psum'd film."""
    from ..render.volpath import trace_wave

    w, h = render_cfg.width, render_cfg.height
    n_pix = w * h

    def shard_body(pixel_idx, key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        kj, kt = jax.random.split(key)
        u = jax.random.uniform(kj, (pixel_idx.shape[0], 2))
        px = (pixel_idx % w).astype(jnp.float32) + u[:, 0]
        py = (pixel_idx // w).astype(jnp.float32) + u[:, 1]
        ro, rd = generate_rays(
            scene, jnp.stack([px, py], axis=-1), w, h, render_cfg.fov_axis
        )
        li = trace_wave(
            scene, kt, ro, rd,
            max_depth=render_cfg.max_depth, rr_depth=render_cfg.rr_depth,
            bsdf_types=render_cfg.bsdf_types or None,
        )
        li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
        image = jnp.zeros((n_pix, 3)).at[pixel_idx].add(li)
        return jax.lax.psum(image, axis_name)

    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis_name), P()), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
