"""Cluster-sweep intersection tests (render/clas.py).

The cluster sweep must agree EXACTLY with the dense brute-force sweep
(closest hit, hit ids, occlusion) — it is a reordering of the same
Möller–Trumbore arithmetic, so matches are bit-level for the chosen
winner. Reference behavior: mitsuba's kd-tree traversal returns the same
closest hit as a linear scan (render/skdtree.h).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

import sdmm_tpu.render.intersect as im  # noqa: E402
import sdmm_tpu.scene.shapes as shp  # noqa: E402
from sdmm_tpu.render import clas  # noqa: E402
from sdmm_tpu.scene.scene import BSDF_DIFFUSE  # noqa: E402


def _sphere_scene(n_spheres=24, seed=0):
    b = make_box_scene(64, 64)
    rng = np.random.default_rng(seed)
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.5, 0.5, 0.5])
    for _ in range(n_spheres):
        c = rng.uniform([-0.9, 0.05, -0.9], [0.9, 1.9, 0.9])
        b.add_shape(shp.make_sphere(c, 0.1, np.eye(4)), white)
    return b.build()


def _rays(n, key):
    ro = jax.random.uniform(key, (n, 3), minval=-0.95, maxval=0.95)
    rd = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return ro, rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def _oracle(scene, ro, rd, t_max=None):
    orig = im.BRUTE_FORCE_MAX
    im.BRUTE_FORCE_MAX = 10**9
    try:
        if t_max is None:
            return im.intersect.__wrapped__(scene, ro, rd)
        return im.occluded.__wrapped__(scene, ro, rd, t_max)
    finally:
        im.BRUTE_FORCE_MAX = orig


def test_clas_matches_bruteforce_closest_hit():
    scene, _ = _sphere_scene()
    ro, rd = _rays(2048, jax.random.PRNGKey(1))
    want = _oracle(scene, ro, rd)
    got = clas.intersect(scene, ro, rd)
    assert np.array_equal(np.asarray(want["tri"]), np.asarray(got["tri"]))
    w_t = np.asarray(want["t"])
    g_t = np.asarray(got["t"])
    hit = np.asarray(want["valid"])
    np.testing.assert_allclose(w_t[hit], g_t[hit], rtol=1e-6)
    assert np.array_equal(hit, np.asarray(got["valid"]))


def test_clas_occlusion_matches():
    scene, _ = _sphere_scene(seed=3)
    ro, rd = _rays(2048, jax.random.PRNGKey(5))
    for dist in (0.3, 0.7, 5.0):
        tm = jnp.full((2048,), dist)
        want = _oracle(scene, ro, rd, tm)
        got = clas.occluded(scene, ro, rd, tm)
        assert np.array_equal(np.asarray(want), np.asarray(got)), dist


def test_clas_t_max_bound():
    scene, _ = _sphere_scene(seed=7)
    ro, rd = _rays(512, jax.random.PRNGKey(9))
    tm = jnp.full((512,), 0.5)
    got = clas.intersect(scene, ro, rd, tm)
    t = np.asarray(got["t"])
    v = np.asarray(got["valid"])
    assert (t[v] < 0.5 + 1e-5).all()


def test_cluster_build_covers_all_triangles():
    scene, _ = _sphere_scene(seed=2)
    ids = np.asarray(scene.clas_ids).ravel()
    real = ids[ids >= 0]
    t = scene.tri_v0.shape[0]
    assert len(real) == t
    assert len(np.unique(real)) == t
    # Cluster AABBs contain their triangles.
    rows = np.asarray(scene.clas_rows)
    t_c = scene.clas_ids.shape[1]
    v0 = rows[:, 0:3 * t_c].reshape(-1, 3, t_c).transpose(0, 2, 1)
    lo = np.asarray(scene.clas_lo)
    valid = np.asarray(scene.clas_ids) >= 0
    assert (v0[valid] >= lo[:, None, :].repeat(t_c, 1)[valid] - 1e-4).all()
