"""Parity of the in-kernel cluster-cull intersector (ops/clas_pallas)
against the XLA cluster sweep (render/clas) — exact hit-id oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdmm_tpu.render import clas


def _scene(n_spheres=6, res=10):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_render import make_box_scene

    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu.scene.scene import BSDF_DIFFUSE

    b = make_box_scene(16, 16)
    rng = np.random.default_rng(3)
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.5] * 3)
    for _ in range(n_spheres):
        c = rng.uniform([-0.8, 0.1, -0.8], [0.8, 1.8, 0.8])
        b.add_shape(
            shp.make_sphere(c, rng.uniform(0.1, 0.3), np.eye(4),
                            n_theta=res, n_phi=2 * res), white)
    return b.build()[0]


def _rays(scene, n, seed=0):
    k = jax.random.PRNGKey(seed)
    lo = scene.tri_v0.min(0) - 0.1
    hi = scene.tri_v0.max(0) + 0.1
    ro = jax.random.uniform(k, (n, 3)) * (hi - lo) + lo
    rd = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    return ro, rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def test_kernel_matches_xla_cluster_sweep():
    from sdmm_tpu.ops import clas_pallas

    scene = _scene()
    # Force a multi-cluster build (t_c=128 on a small mesh).
    c = clas.build_clusters(
        np.asarray(scene.tri_v0, np.float32),
        np.asarray(scene.tri_e1, np.float32),
        np.asarray(scene.tri_e2, np.float32), t_c=128)
    scene = scene._replace(
        clas_lo=jnp.asarray(c["lo"]), clas_hi=jnp.asarray(c["hi"]),
        clas_rows=jnp.asarray(c["rows"]), clas_ids=jnp.asarray(c["ids"]),
        clas_woop=jnp.asarray(c["woop"]), clas_aabb=jnp.asarray(c["aabb"]),
    )
    assert c["rows"].shape[0] >= 4  # genuinely multi-cluster

    ro, rd = _rays(scene, 4096)
    ref = clas.intersect(scene, ro, rd)
    got = clas_pallas.intersect(scene, ro, rd, interpret=True)

    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(ref["tri"]))
    v = np.asarray(ref["valid"])
    np.testing.assert_allclose(np.asarray(got["t"])[v],
                               np.asarray(ref["t"])[v], rtol=2e-4,
                               atol=2e-5)


def test_kernel_occluded_matches():
    from sdmm_tpu.ops import clas_pallas

    scene = _scene()
    c = clas.build_clusters(
        np.asarray(scene.tri_v0, np.float32),
        np.asarray(scene.tri_e1, np.float32),
        np.asarray(scene.tri_e2, np.float32), t_c=128)
    scene = scene._replace(
        clas_lo=jnp.asarray(c["lo"]), clas_hi=jnp.asarray(c["hi"]),
        clas_rows=jnp.asarray(c["rows"]), clas_ids=jnp.asarray(c["ids"]),
        clas_woop=jnp.asarray(c["woop"]), clas_aabb=jnp.asarray(c["aabb"]),
    )
    ro, rd = _rays(scene, 2048, seed=5)
    t_max = jnp.full((2048,), 1.5)
    ref = clas.occluded(scene, ro, rd, t_max)
    got = clas_pallas.occluded(scene, ro, rd, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
