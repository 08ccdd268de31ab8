"""Native C++ BVH builder vs the numpy oracle."""

import numpy as np
import pytest

from sdmm_tpu.native import bvh_build_native, have_native
from sdmm_tpu.render.bvh import build_bvh


def random_tris(n, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(n, 1, 3) * 10
    return base + rng.rand(n, 3, 3)


@pytest.mark.skipif(not have_native(), reason="native toolchain unavailable")
def test_native_matches_python_builder():
    verts = random_tris(500)
    py = build_bvh(verts)  # n < threshold → numpy path
    nat = bvh_build_native(verts.astype(np.float32))
    assert nat is not None
    assert len(nat["lo"]) == len(py["lo"])
    np.testing.assert_allclose(nat["lo"], py["lo"], atol=1e-5)
    np.testing.assert_allclose(nat["hi"], py["hi"], atol=1e-5)
    np.testing.assert_array_equal(nat["miss"], py["miss"])
    np.testing.assert_array_equal(nat["leaf_start"], py["leaf_start"])
    np.testing.assert_array_equal(nat["leaf_count"], py["leaf_count"])
    # Same triangle SET per leaf (intra-leaf order differs: nth_element
    # vs stable sort).
    for ls, lc in zip(py["leaf_start"], py["leaf_count"]):
        if ls >= 0:
            assert set(nat["perm"][ls : ls + lc]) == set(py["perm"][ls : ls + lc])


@pytest.mark.skipif(not have_native(), reason="native toolchain unavailable")
def test_native_traversal_correct():
    """Traverse a native-built BVH on device and compare with brute force."""
    import jax.numpy as jnp

    from sdmm_tpu.core.frame import normalize
    from sdmm_tpu.render import bvh as bvh_mod
    from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder
    from sdmm_tpu.scene.shapes import TriSoup

    verts = random_tris(30000, seed=3)  # > native threshold
    soup = TriSoup()
    soup.add(verts)
    b = SceneBuilder()
    w = b.add_bsdf(BSDF_DIFFUSE)
    b.add_shape(soup, w)
    scene, cfg = b.build()

    import jax

    key = jax.random.PRNGKey(0)
    n = 128
    ro = jnp.asarray(np.random.RandomState(1).rand(n, 3) * 10 - 2, jnp.float32)
    rd = normalize(jax.random.normal(key, (n, 3)))
    hit = bvh_mod.traverse(scene, ro, rd)
    # Brute-force oracle on a subset.
    from sdmm_tpu.render.intersect import _mt_chunk

    t, u, v, h = _mt_chunk(
        ro, rd, scene.tri_v0, scene.tri_e1, scene.tri_e2, jnp.full((n,), 3.4e38)
    )
    t = jnp.where(h, t, 3.4e38)
    bf_t = jnp.min(t, axis=-1)
    bf_valid = bf_t < 3.4e37
    np.testing.assert_array_equal(np.asarray(hit["valid"]), np.asarray(bf_valid))
    sel = np.asarray(bf_valid)
    np.testing.assert_allclose(
        np.asarray(hit["t"])[sel], np.asarray(bf_t)[sel], rtol=1e-4
    )


def test_native_obj_loader_matches_python():
    """native/mesh_loader.cpp must emit the same triangle soup as the
    Python OBJ parser (fan triangulation, negative indices, mixed
    vn/vt presence, transforms, flipNormals)."""
    import os
    import tempfile

    import numpy as np

    from sdmm_tpu import native as nat
    from sdmm_tpu.scene import shapes as shp

    if not nat.have_native():
        import pytest

        pytest.skip("no native toolchain")

    obj = """# test mesh
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vn 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f 1 2 5
f -5/-4 -4/-3 -1/-1
f 1//2 3//2 5//2
"""
    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write(obj)
        path = f.name
    try:
        m = np.eye(4)
        m[:3, :3] = np.diag([2.0, 1.0, 0.5])
        m[:3, 3] = [1.0, -2.0, 0.3]
        for to_world, flip, face_n in [
            (None, False, False), (m, False, False),
            (None, True, False), (m, True, True),
        ]:
            s_nat = shp.load_obj(path, to_world, flip, face_n)
            os.environ["SDMM_TPU_NO_NATIVE"] = "1"
            try:
                s_py = shp.load_obj(path, to_world, flip, face_n)
            finally:
                del os.environ["SDMM_TPU_NO_NATIVE"]
            v_a, n_a, uv_a, _ = s_nat.concat()
            v_b, n_b, uv_b, _ = s_py.concat()
            assert v_a.shape == v_b.shape, (v_a.shape, v_b.shape)
            np.testing.assert_allclose(v_a, v_b, atol=1e-12)
            # Normals compared as directions (normalization may differ).
            na = n_a / np.maximum(
                np.linalg.norm(n_a, axis=-1, keepdims=True), 1e-20)
            nb = n_b / np.maximum(
                np.linalg.norm(n_b, axis=-1, keepdims=True), 1e-20)
            np.testing.assert_allclose(na, nb, atol=1e-9)
            np.testing.assert_allclose(uv_a, uv_b, atol=1e-12)
    finally:
        os.unlink(path)
