"""Compare cluster-sweep (render/clas.py) vs threaded BVH (render/bvh.py)
intersection throughput on a large mesh scene.

Usage: python scripts/bench_clas.py [scene-name]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sdmm_tpu.utils.cache import enable as enable_cache

enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sdmm_tpu.render import bvh, clas  # noqa: E402
from sdmm_tpu.scene.xml_loader import load_scene  # noqa: E402

N_SPHERES = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def rays_for(scene, n, seed=0):
    k = jax.random.PRNGKey(seed)
    lo = scene.tri_v0.min(0) - 0.1
    hi = scene.tri_v0.max(0) + 0.1
    ro = jax.random.uniform(k, (n, 3)) * (hi - lo) + lo
    rd = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    return ro, rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def synthetic_scene(n_spheres):
    """Box + n_spheres tessellated spheres (~800 tris each): the test-suite
    meshes are git-lfs pointers, so large meshes are generated."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    from test_render import make_box_scene

    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu.scene.scene import BSDF_DIFFUSE

    b = make_box_scene(64, 64)
    rng = np.random.default_rng(0)
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.5, 0.5, 0.5])
    for _ in range(n_spheres):
        c = rng.uniform([-0.9, 0.05, -0.9], [0.9, 1.9, 0.9])
        b.add_shape(shp.make_sphere(c, rng.uniform(0.03, 0.12), np.eye(4)),
                    white)
    return b.build()


def main():
    scene, cfg = synthetic_scene(N_SPHERES)
    t = int(scene.tri_v0.shape[0])
    print(f"tris={t} clusters={scene.clas_lo.shape[0]} "
          f"t_c={scene.clas_ids.shape[1]}")

    n = 1 << 17
    ro, rd = rays_for(scene, n)

    for name, fn in (("clas", lambda: clas.intersect(scene, ro, rd)),
                     ("bvh", lambda: bvh.traverse(scene, ro, rd, None, False))):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:8.2f} ms  {n / dt / 1e6:8.2f} Mrays/s  "
              f"hits={int(np.asarray(r['valid' if isinstance(r, dict) else 0]).sum()) if isinstance(r, dict) else '-'}")

    # agreement check
    a = clas.intersect(scene, ro, rd)
    b = bvh.traverse(scene, ro, rd, None, False)
    same = np.array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    print("tri ids identical:", same)
    if not same:
        d = np.asarray(a["tri"]) != np.asarray(b["tri"])
        print("  mismatches:", d.sum(), "of", n)
        ta, tb = np.asarray(a["t"])[d], np.asarray(b["t"])[d]
        print("  max |t| diff on mismatches:", np.abs(ta - tb).max())


if __name__ == "__main__":
    main()
