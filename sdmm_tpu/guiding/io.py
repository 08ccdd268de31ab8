"""Guiding-model checkpoints (.asdmm) and learned-BSDF mixtures (.sdmm).

Equivalent of ``sdmm::save_json`` / ``load_json``
(reference: volpath_sdmm.cpp:121-130 saveCheckpoint →
checkpoints/model_NNNNN.asdmm; mitsuba/src/bsdfs/diffuse.cpp:101-114 loads
.sdmm learned-BSDF mixtures). The reference's exact JSON schema lives in the
missing submodule (its on-disk assets are git-lfs stubs), so this defines a
self-contained JSON schema carrying the same information: the spatial tree,
per-leaf mixture parameters, and normalization metadata.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .mixture import SDMM
from .stree import STree


def save_checkpoint(path: str, trainer) -> None:
    """Serialize a trainer's guiding state to .asdmm JSON."""
    t = trainer.tree
    obj = {
        "format": "asdmm",
        "version": 1,
        "spatial_norm": trainer.spatial_norm,
        "aabb_lo": np.asarray(trainer.scene.aabb_lo).tolist(),
        "n_components": trainer.cfg.n_components,
        "iteration": trainer.iteration,
        "tree": {
            "lo": t.lo.tolist(),
            "hi": t.hi.tolist(),
            "axis": list(map(int, t.axis)),
            "split": list(map(float, t.split)),
            "child": list(map(int, t.child)),
            "leaf": list(map(int, t.leaf)),
            "depth": list(map(int, t.depth)),
            "n_leaves": t.n_leaves,
            "max_leaves": t.max_leaves,
            "split_threshold": t.split_threshold,
            "leaf_counts": t.leaf_counts.tolist(),
        },
        "mixture": {
            "weight": np.asarray(trainer.sdmm.weight).tolist(),
            "mean": np.asarray(trainer.sdmm.mean).tolist(),
            "cov": np.asarray(trainer.sdmm.cov).tolist(),
        },
        "initialized": np.asarray(trainer.initialized).tolist(),
    }
    with open(path, "w") as f:
        json.dump(obj, f)


def load_checkpoint(path: str):
    """Load .asdmm JSON → (STree, SDMM, initialized, meta)."""
    with open(path) as f:
        obj = json.load(f)
    td = obj["tree"]
    tree = STree(
        np.asarray(td["lo"]), np.asarray(td["hi"]),
        max_leaves=td["max_leaves"], split_threshold=td["split_threshold"],
    )
    tree.axis = list(td["axis"])
    tree.split = list(td["split"])
    tree.child = list(td["child"])
    tree.leaf = list(td["leaf"])
    tree.depth = list(td["depth"])
    tree.n_leaves = td["n_leaves"]
    tree.leaf_counts = np.asarray(td["leaf_counts"])
    # Rebuild node bounds by walking the tree.
    n_nodes = len(tree.axis)
    tree.node_lo = [None] * n_nodes
    tree.node_hi = [None] * n_nodes
    tree.node_lo[0] = tree.lo.copy()
    tree.node_hi[0] = tree.hi.copy()
    for i in range(n_nodes):
        c = tree.child[i]
        if c >= 0:
            ax, sp = tree.axis[i], tree.split[i]
            for side in range(2):
                lo = tree.node_lo[i].copy()
                hi = tree.node_hi[i].copy()
                if side == 0:
                    hi[ax] = sp
                else:
                    lo[ax] = sp
                tree.node_lo[c + side] = lo
                tree.node_hi[c + side] = hi
    m = obj["mixture"]
    sdmm = SDMM(
        weight=jnp.asarray(m["weight"], dtype=jnp.float32),
        mean=jnp.asarray(m["mean"], dtype=jnp.float32),
        cov=jnp.asarray(m["cov"], dtype=jnp.float32),
    )
    initialized = jnp.asarray(obj["initialized"], dtype=bool)
    meta = {
        "spatial_norm": obj["spatial_norm"],
        "aabb_lo": np.asarray(obj["aabb_lo"]),
        "iteration": obj["iteration"],
        "n_components": obj["n_components"],
    }
    return tree, sdmm, initialized, meta


def save_bsdf_mixture(path: str, weight, mean_dir, cov2):
    """Write a directional-only learned-BSDF mixture (.sdmm schema)."""
    obj = {
        "format": "sdmm",
        "version": 1,
        "weight": np.asarray(weight).tolist(),
        "mean_dir": np.asarray(mean_dir).tolist(),
        "cov": np.asarray(cov2).tolist(),
    }
    with open(path, "w") as f:
        json.dump(obj, f)


def load_bsdf_mixture(path: str):
    with open(path) as f:
        obj = json.load(f)
    return (
        jnp.asarray(obj["weight"], dtype=jnp.float32),
        jnp.asarray(obj["mean_dir"], dtype=jnp.float32),
        jnp.asarray(obj["cov"], dtype=jnp.float32),
    )


def save_full_checkpoint(path: str, trainer, iters) -> None:
    """Mid-render resume checkpoint (.npz): the .asdmm model state PLUS
    the EM running statistics, leaf counters, and per-iteration film
    accumulators. The reference cannot resume a training render
    (SURVEY §5: "No mid-render resume of the EM state in the built
    path"); with deterministic per-iteration RNG keys a restored run
    continues bit-identically."""
    t = trainer.tree
    tree_meta = {
        "lo": t.lo.tolist(), "hi": t.hi.tolist(),
        "axis": list(map(int, t.axis)), "split": list(map(float, t.split)),
        "child": list(map(int, t.child)), "leaf": list(map(int, t.leaf)),
        "depth": list(map(int, t.depth)), "n_leaves": t.n_leaves,
        "max_leaves": t.max_leaves, "split_threshold": t.split_threshold,
    }
    em = trainer.em
    np.savez_compressed(
        path,
        meta=json.dumps({
            "tree": tree_meta,
            "spatial_norm": trainer.spatial_norm,
            "iteration": trainer.iteration,
            "total_spp": trainer.total_spp,
            "n_components": trainer.cfg.n_components,
            "stats": trainer.stats,
        }),
        leaf_counts=np.asarray(t.leaf_counts),
        weight=np.asarray(trainer.sdmm.weight),
        mean=np.asarray(trainer.sdmm.mean),
        cov=np.asarray(trainer.sdmm.cov),
        em_stats_w=np.asarray(em.stats_w),
        em_stats_mean=np.asarray(em.stats_mean),
        em_stats_cov=np.asarray(em.stats_cov),
        em_total_weight=np.asarray(em.total_weight),
        em_iterations=np.asarray(em.iterations),
        initialized=np.asarray(trainer.initialized),
        cum_counts=np.asarray(trainer.cum_counts),
        it_image=np.stack([i["image"] for i in iters])
        if iters else np.zeros((0, 1, 3)),
        it_sqr=np.stack([i["sqr"] for i in iters])
        if iters else np.zeros((0, 1, 3)),
        it_weight=np.stack([i["weight"] for i in iters])
        if iters else np.zeros((0, 1)),
    )


def load_full_checkpoint(path: str):
    """Load a resume checkpoint; returns (state dict, iters list)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    td = meta["tree"]
    tree = STree(
        np.asarray(td["lo"]), np.asarray(td["hi"]),
        max_leaves=td["max_leaves"], split_threshold=td["split_threshold"],
    )
    tree.axis = list(td["axis"])
    tree.split = list(td["split"])
    tree.child = list(td["child"])
    tree.leaf = list(td["leaf"])
    tree.depth = list(td["depth"])
    tree.n_leaves = td["n_leaves"]
    tree.leaf_counts = z["leaf_counts"]
    n_nodes = len(tree.axis)
    tree.node_lo = [None] * n_nodes
    tree.node_hi = [None] * n_nodes
    tree.node_lo[0] = tree.lo.copy()
    tree.node_hi[0] = tree.hi.copy()
    for i in range(n_nodes):
        c = tree.child[i]
        if c >= 0:
            ax, sp = tree.axis[i], tree.split[i]
            for side in range(2):
                lo = tree.node_lo[i].copy()
                hi = tree.node_hi[i].copy()
                if side == 0:
                    hi[ax] = sp
                else:
                    lo[ax] = sp
                tree.node_lo[c + side] = lo
                tree.node_hi[c + side] = hi
    from .em import EMState

    state = {
        "tree": tree,
        "sdmm": SDMM(jnp.asarray(z["weight"]), jnp.asarray(z["mean"]),
                     jnp.asarray(z["cov"])),
        "em": EMState(
            stats_w=jnp.asarray(z["em_stats_w"]),
            stats_mean=jnp.asarray(z["em_stats_mean"]),
            stats_cov=jnp.asarray(z["em_stats_cov"]),
            total_weight=jnp.asarray(z["em_total_weight"]),
            iterations=jnp.asarray(z["em_iterations"]),
        ),
        "initialized": jnp.asarray(z["initialized"]),
        "cum_counts": z["cum_counts"],
        "iteration": meta["iteration"],
        "total_spp": meta["total_spp"],
        "stats": meta["stats"],
    }
    iters = [
        {"image": z["it_image"][i], "sqr": z["it_sqr"][i],
         "weight": z["it_weight"][i]}
        for i in range(z["it_image"].shape[0])
    ]
    return state, iters
