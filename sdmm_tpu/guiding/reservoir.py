"""Sample reservoir with prioritized experience replay.

TPU-native equivalent of the reference's Samples buffer with priority-
weighted decayed re-use and Russian-roulette down-sampling
(reference: mitsuba/src/integrators/dmm/jmm/samples.h — decayed replay
:355-391, ``russianRoulette`` :392-432). Instead of a mutexed growable
buffer, the reservoir is a fixed-capacity SoA of device arrays updated by
one jitted merge step per iteration:

1. stored sample priorities decay by ``decay`` (age-weighted replay),
2. the new batch is appended,
3. if over capacity, each sample survives RR with probability
   p_i = min(1, cap·pr_i/Σpr) and surviving weights are divided by p_i
   (unbiased), then survivors are compacted to the fixed capacity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def make_reservoir(capacity: int):
    return {
        "pos": jnp.zeros((capacity, 3)),
        # Position used for leaf lookup. Identical to ``pos`` for ordinary
        # samples; for jitter replicas it is the jittered position that
        # selected the destination leaf, so re-deriving leaf = find(lookup)
        # after a merge (or a tree refit) still routes the replica to its
        # neighboring leaf instead of collapsing it onto the source leaf
        # (reference: push_back_data stores the original vertex in the
        # context found at the jittered position, sdmm_proc.cpp:923-964).
        "lookup_pos": jnp.zeros((capacity, 3)),
        "dir": jnp.zeros((capacity, 3)),
        "weight": jnp.zeros((capacity,)),
        "priority": jnp.zeros((capacity,)),
        "valid": jnp.zeros((capacity,), dtype=bool),
    }


@partial(jax.jit, static_argnames=("capacity",))
def reservoir_update(res: dict, pos, d, wgt, valid, key, capacity: int,
                     decay: float = 0.5, lookup_pos=None):
    """Merge a new sample batch into the reservoir; returns the new reservoir.

    New samples enter with priority = |weight| (the reference prioritizes
    by sample contribution); stored priorities decay by ``decay`` per
    iteration so stale samples are progressively RR'd away.
    """
    if lookup_pos is None:
        lookup_pos = pos
    pr_old = res["priority"] * decay
    pr_new = jnp.abs(wgt) + 1e-6
    all_pos = jnp.concatenate([res["pos"], pos])
    all_lookup = jnp.concatenate([res["lookup_pos"], lookup_pos])
    all_dir = jnp.concatenate([res["dir"], d])
    all_w = jnp.concatenate([res["weight"], wgt])
    all_pr = jnp.concatenate([pr_old, jnp.where(valid, pr_new, 0.0)])
    all_valid = jnp.concatenate([res["valid"], valid])
    all_pr = jnp.where(all_valid, all_pr, 0.0)

    n_valid = jnp.sum(all_valid)
    total_pr = jnp.sum(all_pr)
    # Survival probability: 1 everywhere while under capacity.
    over = n_valid > capacity
    p = jnp.where(
        over,
        jnp.minimum(1.0, capacity * all_pr / jnp.maximum(total_pr, 1e-30)),
        1.0,
    )
    u = jax.random.uniform(key, all_valid.shape)
    survive = all_valid & (u < p)
    w_corr = jnp.where(survive, all_w / jnp.maximum(p, 1e-12), 0.0)

    # Compact survivors to the front (stable): order = survivors first.
    order = jnp.argsort(~survive)  # False (=survivor) sorts first
    take = order[:capacity]
    kept = survive[take]
    return {
        "pos": jnp.where(kept[:, None], all_pos[take], 0.5),
        "lookup_pos": jnp.where(kept[:, None], all_lookup[take], 0.5),
        "dir": jnp.where(kept[:, None], all_dir[take],
                         jnp.array([0.0, 0.0, 1.0])),
        # -1 marks invalid entries for the EM (em.py treats weight < 0 as
        # padding).
        "weight": jnp.where(kept, w_corr[take], -1.0),
        "priority": jnp.where(kept, all_pr[take], 0.0),
        "valid": kept,
    }
