#!/usr/bin/env python
"""EM throughput benchmark: component-updates/s at reference scale.

Reference protocol scale: 2048 leaves × 16 components, ~2M samples per
iteration cap (BASELINE.md). Reports the full em_step (prepare + E-step
segment-sum + M-step) wall time on one chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from sdmm_tpu.utils.cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from sdmm_tpu.guiding import em as em_mod
    from sdmm_tpu.guiding import init as init_mod
    from sdmm_tpu.guiding.stree import STree

    L, K, S = 2048, 16, 1 << 21  # 2M samples
    tree = STree([0, 0, 0], [1, 1, 1], max_leaves=L, split_threshold=1)
    tree.split_to_depth(11)  # fills all 2048 leaves
    tables = tree.device_tables()
    sdmm = init_mod.init_leaf_params(
        jax.random.PRNGKey(0), tables["leaf_lo"], tables["leaf_hi"], K
    )
    em = em_mod.init_em_state(L, K)
    cfg = em_mod.EMConfig(batch_size=1 << 17)

    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (S, 3))
    d = jax.random.normal(jax.random.fold_in(key, 1), (S, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wgt = jax.random.uniform(jax.random.fold_in(key, 2), (S,))
    from sdmm_tpu.guiding.stree import find_leaf

    leaf = find_leaf(tables, pos)
    active = jnp.ones((L,), dtype=bool)

    def step(sdmm, em, i):
        return em_mod.em_step(sdmm, em, pos, d, wgt + 0.0 * i, leaf, active, cfg)

    sdmm2, em2, cnt = step(sdmm, em, 0)
    jax.block_until_ready(sdmm2.weight)
    iters = 4
    t0 = time.perf_counter()
    s_, e_ = sdmm, em
    for i in range(1, iters + 1):
        s_, e_, cnt = step(s_, e_, i)
    jax.block_until_ready(s_.weight)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "em_step_full",
        "seconds": round(dt, 4),
        "component_updates_per_s": round(L * K / dt, 1),
        "sample_component_evals_per_s": round(S * K / dt, 1),
        "leaves": L, "components": K, "samples": S,
    }))


if __name__ == "__main__":
    main()
