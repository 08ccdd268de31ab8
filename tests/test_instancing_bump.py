"""Instancing (shapegroup/instance) and bump mapping tests.

Reference parity: src/shapes/{shapegroup,instance}.cpp (flattened to
transformed triangle copies at build time) and src/bsdfs/bumpmap.cpp
(height-texture normal perturbation)."""

import jax.numpy as jnp
import numpy as np

from sdmm_tpu.render import intersect as isect
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder
from sdmm_tpu.scene.shapes import make_rectangle


def test_trisoup_transformed():
    s = make_rectangle(np.eye(4))
    m = np.eye(4)
    m[:3, 3] = [5.0, 0.0, 0.0]
    s2 = s.transformed(m)
    v, n, _, _ = s2.concat()
    v0, n0, _, _ = s.concat()
    np.testing.assert_allclose(v, v0 + np.array([5.0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(n, n0, atol=1e-6)


def test_instance_xml_flattening(tmp_path):
    xml = """<scene version="0.6.0">
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
      <shape type="shapegroup" id="grp">
        <shape type="rectangle">
          <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
        </shape>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld"><translate x="3"/></transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld"><translate x="-3"/></transform>
      </shape>
    </scene>"""
    p = tmp_path / "inst.xml"
    p.write_text(xml)
    from sdmm_tpu.scene.xml_loader import load_scene

    b = load_scene(str(p))
    scene, cfg = b.build()
    # Two instances of a 2-triangle rectangle; the group itself not rendered.
    assert scene.tri_v0.shape[0] == 4
    xs = np.asarray(scene.tri_v0[:, 0])
    assert (xs > 0).sum() == 2 and (xs < 0).sum() == 2


def test_bumpmap_perturbs_normals():
    b = SceneBuilder()
    # Height ramp along u: constant gradient tilts normals.
    ramp = np.tile(np.linspace(0.0, 1.0, 64)[None, :, None], (64, 1, 3)).astype(
        np.float32
    )
    tex = b.add_texture(ramp)
    mat = b.add_bsdf(BSDF_DIFFUSE, bump=tex, bump_scale=0.5)
    b.add_shape(make_rectangle(np.eye(4)), mat)
    scene, cfg = b.build()
    assert cfg.has_bump

    n = 64
    ro = jnp.concatenate(
        [jnp.linspace(-0.5, 0.5, n)[:, None], jnp.zeros((n, 1)), jnp.full((n, 1), 2.0)],
        axis=1,
    )
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    ns1 = np.asarray(isect.apply_bumpmap(scene, it))
    assert np.asarray(hit["valid"]).all()
    # A height ramp increasing along u tilts normals consistently toward -x
    # (texture resampling is piecewise-constant, so plateaus keep z=1, but
    # no normal may tilt the wrong way).
    tilt_x = ns1[:, 0]
    assert (tilt_x <= 1e-6).all()
    assert (tilt_x < -1e-3).sum() > n // 4
    np.testing.assert_allclose(np.linalg.norm(ns1, axis=-1), 1.0, atol=1e-5)
    # Without a bump texture normals are untouched.
    b2 = SceneBuilder()
    m2 = b2.add_bsdf(BSDF_DIFFUSE)
    b2.add_shape(make_rectangle(np.eye(4)), m2)
    scene2, cfg2 = b2.build()
    assert not cfg2.has_bump
    hit2 = isect.intersect(scene2, ro, rd)
    it2 = isect.surface_interaction(scene2, ro, rd, hit2)
    np.testing.assert_allclose(
        np.asarray(isect.apply_bumpmap(scene2, it2)), np.asarray(it2["ns"])
    )
