"""BVH build/traversal vs brute force; mesh loader round trips."""

import struct
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.core.frame import normalize
from sdmm_tpu.render import bvh as bvh_mod
from sdmm_tpu.render import intersect as isect
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder
from sdmm_tpu.scene import shapes as shp
from sdmm_tpu.scene.serialized import load_ply, load_serialized


def random_sphere_scene(n_theta=24, n_phi=48):
    b = SceneBuilder()
    white = b.add_bsdf(BSDF_DIFFUSE)
    b.add_shape(shp.make_sphere([0.0, 0.0, 0.0], 1.0, n_theta=n_theta, n_phi=n_phi), white)
    b.add_shape(shp.make_cube(np.diag([3.0, 3.0, 3.0, 1.0])), white)
    return b.build()


def test_bvh_matches_brute_force():
    scene, cfg = random_sphere_scene()
    n_tris = int(scene.tri_v0.shape[0])
    assert n_tris > isect.BRUTE_FORCE_MAX  # ensures BVH path is exercised
    key = jax.random.PRNGKey(0)
    n = 512
    ro = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0.0, 2.0])
    rd = normalize(jax.random.normal(jax.random.fold_in(key, 1), (n, 3)))
    hit_bvh = bvh_mod.traverse(scene, ro, rd)
    # Brute force on the same scene (bypass dispatch).
    nb = isect._pick_chunk(n_tris, 1 << 20)  # single big chunk
    t, u, v, hit = isect._mt_chunk(
        ro, rd, scene.tri_v0, scene.tri_e1, scene.tri_e2, jnp.full((n,), 3.4e38)
    )
    t = jnp.where(hit, t, 3.4e38)
    best = jnp.argmin(t, axis=-1)
    bf_t = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
    bf_valid = bf_t < 3.4e37
    np.testing.assert_array_equal(np.asarray(hit_bvh["valid"]), np.asarray(bf_valid))
    sel = np.asarray(bf_valid)
    np.testing.assert_allclose(
        np.asarray(hit_bvh["t"])[sel], np.asarray(bf_t)[sel], rtol=1e-4
    )
    # Same triangle hit (or same-t duplicate edge hit).
    tri_bf = np.asarray(jnp.take_along_axis(
        jnp.arange(n_tris)[None, :].repeat(n, 0), best[:, None], axis=-1)[:, 0])
    same = np.asarray(hit_bvh["tri"])[sel] == tri_bf[sel]
    assert same.mean() > 0.97  # ties on shared edges may differ


def test_bvh_occlusion():
    scene, cfg = random_sphere_scene()
    ro = jnp.array([[0.0, 0.0, 2.0], [2.0, 2.0, 2.0]])
    rd = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    occ = bvh_mod.traverse(scene, ro, rd, jnp.array([3.0, 3.0]), any_hit=True)
    assert bool(occ[0])  # hits the unit sphere at t=1
    # Second ray starts inside the size-3 cube; first surface is the bottom
    # face at t=5 > t_max=3 → unoccluded.
    assert not bool(occ[1])
    occ2 = bvh_mod.traverse(scene, ro, rd, jnp.array([6.0, 6.0]), any_hit=True)
    assert bool(occ2[1])  # now the bottom face at t=5 is within range


def _write_serialized_v4(path, positions, normals, faces):
    flags = 0x1000 | (0x0001 if normals is not None else 0)
    body = struct.pack("<I", flags)
    body += b"mesh\x00"
    body += struct.pack("<QQ", len(positions), len(faces))
    body += np.asarray(positions, np.float32).tobytes()
    if normals is not None:
        body += np.asarray(normals, np.float32).tobytes()
    body += np.asarray(faces, np.uint32).tobytes()
    comp = zlib.compress(body)
    with open(path, "wb") as f:
        f.write(struct.pack("<hh", 0x041C, 0x0004))
        f.write(comp)
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<I", 1))


def test_serialized_roundtrip(tmp_path):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float64)
    nrm = np.tile([[0.0, 0.0, 1.0]], (4, 1))
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    p = str(tmp_path / "mesh.serialized")
    _write_serialized_v4(p, pos, nrm, faces)
    m = load_serialized(p, 0)
    np.testing.assert_allclose(m["positions"], pos, atol=1e-6)
    np.testing.assert_allclose(m["normals"], nrm, atol=1e-6)
    np.testing.assert_array_equal(m["faces"], faces)


def test_ply_roundtrip_ascii(tmp_path):
    p = str(tmp_path / "tri.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
        )
    m = load_ply(p)
    assert m["positions"].shape == (3, 3)
    np.testing.assert_array_equal(m["faces"], [[0, 1, 2]])


def test_mesh_to_soup_and_render():
    mesh = {
        "positions": np.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=np.float64
        ),
        "normals": None,
        "uv": None,
        "faces": np.array([[0, 1, 2], [0, 2, 3]]),
        "face_normals": True,
    }
    soup = shp.mesh_to_soup(mesh)
    v, n, _uv, _vc = soup.concat()
    assert v.shape == (2, 3, 3)
    np.testing.assert_allclose(n[:, 0, :], [[0, 0, 1], [0, 0, 1]], atol=1e-12)
