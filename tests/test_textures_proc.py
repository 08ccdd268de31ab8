"""Procedural textures (reference: mitsuba/src/textures/{checkerboard,
gridtexture,wireframe,vertexcolors,curvature}.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

import sdmm_tpu.scene.shapes as shp
from sdmm_tpu.bsdf.bsdf import eval_proc_texture, gather_params
from sdmm_tpu.scene.scene import (
    BSDF_DIFFUSE,
    PROC_CHECKERBOARD,
    PROC_GRID,
    PROC_MESHATTR,
    PROC_WIREFRAME,
    SceneBuilder,
)


def _box_with_tex(kind_kwargs, colors=None):
    b = SceneBuilder()
    tex = b.add_proc_texture(**kind_kwargs)
    mat = b.add_bsdf(BSDF_DIFFUSE, tex=tex)
    soup = shp.make_rectangle(np.eye(4))
    if colors is not None:
        v, n, uv, _ = soup.concat()
        soup = shp.TriSoup()
        soup.add(v, n, uv, colors)
    b.add_shape(soup, mat)
    b.set_sensor(np.eye(4), 45.0, 8, 8)
    return b.build()


def _ref_checker(u, v, c0, c1):
    x = 2 * (np.trunc(u * 2).astype(int) % 2) - 1
    y = 2 * (np.trunc(v * 2).astype(int) % 2) - 1
    return np.where((x * y == 1)[..., None], c0, c1)


def test_checkerboard_matches_reference_formula():
    scene, _ = _box_with_tex(dict(
        kind=PROC_CHECKERBOARD, color0=(1, 0, 0), color1=(0, 0, 1),
        uscale=3.0, uoffset=0.25))
    rng = np.random.default_rng(0)
    uv = rng.uniform(0, 1, (256, 2)).astype(np.float32)
    got = np.asarray(eval_proc_texture(
        scene, jnp.zeros(256, jnp.int32), jnp.asarray(uv)))
    want = _ref_checker(uv[:, 0] * 3.0 + 0.25, uv[:, 1],
                        np.array([1, 0, 0.0]), np.array([0, 0, 1.0]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gridtexture_lines():
    scene, _ = _box_with_tex(dict(
        kind=PROC_GRID, color0=(0.2,) * 3, color1=(0.9,) * 3,
        line_width=0.05))
    uv = jnp.asarray([[0.01, 0.3], [0.3, 0.3], [0.5, 0.97], [0.52, 0.4]],
                     jnp.float32)
    got = np.asarray(eval_proc_texture(scene, jnp.zeros(4, jnp.int32), uv))
    # On-line: u=0.01 (<0.05 from 0), v=0.97 (0.03 from 1); interior others.
    np.testing.assert_allclose(got[:, 0], [0.9, 0.2, 0.9, 0.2], atol=1e-6)


def test_vertexcolors_interpolates_and_reaches_albedo():
    from sdmm_tpu.render.intersect import intersect, surface_interaction

    colors = np.zeros((2, 3, 3))
    colors[:, 0] = [1, 0, 0]
    colors[:, 1] = [0, 1, 0]
    colors[:, 2] = [0, 0, 1]
    scene, _ = _box_with_tex(dict(kind=PROC_MESHATTR), colors=colors)
    assert scene.tri_vc.shape[0] == 2
    # Ray straight down the z axis hits the rectangle at uv interior.
    ro = jnp.asarray([[0.1, 0.2, 1.0], [-0.3, 0.1, 1.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    hit = intersect(scene, ro, rd)
    it = surface_interaction(scene, ro, rd, hit)
    assert it["uv"].shape[-1] == 6
    vc = np.asarray(it["uv"][:, 2:5])
    np.testing.assert_allclose(vc.sum(-1), 1.0, atol=1e-5)  # barycentric
    p = gather_params(scene, it["bsdf"], it["uv"])
    np.testing.assert_allclose(np.asarray(p["albedo"]), vc, atol=1e-6)


def test_wireframe_edge_vs_interior():
    from sdmm_tpu.render.intersect import intersect, surface_interaction

    scene, _ = _box_with_tex(dict(
        kind=PROC_WIREFRAME, color0=(0.0, 0.0, 0.0), color1=(1.0, 1.0, 1.0),
        line_width=0.05, step_width=0.5))
    assert scene.tri_eh.shape[0] == 2
    # Rectangle spans [-1,1]^2; the diagonal edge runs x=y.
    ro = jnp.asarray([
        [0.5, 0.49, 1.0],   # on the diagonal edge
        [0.9, -0.88, 1.0],  # near two outer edges? x=0.9, y=-0.88 interior
        [0.0, -0.5, 1.0],   # interior of lower triangle
    ])
    rd = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    hit = intersect(scene, ro, rd)
    it = surface_interaction(scene, ro, rd, hit)
    p = gather_params(scene, it["bsdf"], it["uv"])
    alb = np.asarray(p["albedo"])
    assert alb[0, 0] < 0.1  # edge → edgeColor
    assert alb[2, 0] > 0.9  # interior → interiorColor
    # Edge distance channel is the true world distance to the diagonal.
    ed = float(np.asarray(it["uv"][0, 5]))
    assert abs(ed - 0.01 / np.sqrt(2)) < 1e-3


def test_curvature_bake_sphere_signs():
    # A sphere has positive curvature everywhere: baked colors are red.
    soup = shp.make_sphere([0.0, 0.0, 0.0], 1.0, n_theta=24, n_phi=48)
    baked = shp.bake_curvature(soup, kind="mean", scale=0.5)
    _, _, _, vc = baked.concat()
    assert baked.has_colors
    interior = vc.reshape(-1, 3)
    # Mean curvature of the unit sphere = 1 → red ≈ 0.5·1 clamped.
    assert np.mean(interior[:, 0]) > 0.3
    assert np.mean(interior[:, 2]) < 0.05

    gauss = shp.bake_curvature(soup, kind="gaussian", scale=0.5)
    _, _, _, vg = gauss.concat()
    assert np.mean(vg.reshape(-1, 3)[:, 0]) > 0.3


def test_xml_procedural_textures_load():
    import os
    import tempfile

    xml = """<scene version="0.6.0">
      <shape type="rectangle">
        <bsdf type="diffuse">
          <texture type="checkerboard" name="reflectance">
            <spectrum name="color0" value="0.8"/>
            <spectrum name="color1" value="0.1"/>
            <float name="uscale" value="4"/>
          </texture>
        </bsdf>
      </shape>
      <shape type="sphere">
        <float name="radius" value="0.5"/>
        <bsdf type="diffuse">
          <texture type="curvature" name="reflectance">
            <float name="scale" value="1.0"/>
          </texture>
        </bsdf>
      </shape>
      <shape type="cube">
        <bsdf type="diffuse">
          <texture type="wireframe" name="reflectance"/>
        </bsdf>
      </shape>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
        </film>
      </sensor>
    </scene>"""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.xml")
        with open(path, "w") as f:
            f.write(xml)
        from sdmm_tpu.scene.xml_loader import load_scene

        builder = load_scene(path)
        scene, cfg = builder.build()
    assert scene.proc_tex.shape[0] == 3
    assert scene.tri_vc.shape[0] > 0  # curvature baked colors
    assert scene.tri_eh.shape[0] > 0  # wireframe edge heights
    # Wireframe auto line width resolved to a positive value.
    assert float(scene.proc_tex[2, 11]) > 0.0


def test_proc_texture_renders():
    from sdmm_tpu.render.wavefront import render_wavefront

    b = SceneBuilder()
    tex = b.add_proc_texture(
        kind=PROC_CHECKERBOARD, color0=(0.9, 0.1, 0.1), color1=(0.1, 0.1, 0.9))
    mat = b.add_bsdf(BSDF_DIFFUSE, tex=tex)
    m = np.eye(4)
    m[2, 3] = 0.0
    b.add_shape(shp.make_rectangle(m), mat)
    b.env_radiance = np.ones(3)
    # Camera at z=2 looking down -z (mitsuba sensors look along +z of
    # camera space; rotate 180° about y).
    cam = np.diag([-1.0, 1.0, -1.0, 1.0])
    cam[2, 3] = 2.0
    b.set_sensor(cam, 60.0, 16, 16)
    scene, cfg = b.build()
    cfg.max_depth = 2
    out = render_wavefront(scene, cfg, spp=16, seed=0, nee=False)
    img = np.asarray(out["image"]).reshape(16, 16, 3)
    assert np.isfinite(img).all()
    # Both checker colors visible: red-dominant and blue-dominant pixels.
    assert (img[..., 0] > img[..., 2]).any()
    assert (img[..., 2] > img[..., 0]).any()
