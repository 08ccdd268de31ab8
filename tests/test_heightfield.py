"""Heightfield shape: tessellation semantics vs the reference plugin
(mitsuba/src/shapes/heightfield.cpp): object space [-1,1]^2 x height,
pow2+1 resampling, uv = grid/(N-1), per-vertex shading normals."""

import numpy as np

from sdmm_tpu.scene import shapes as shp


def test_flat_heightfield_geometry():
    # Constant height 0.5 on a 5x5 grid -> a flat square at z = 0.5.
    data = np.full((5, 5), 0.5)
    soup = shp.make_heightfield(data)
    v, n, uv, _ = soup.concat()
    assert v.shape == (32, 3, 3)  # 4x4 cells x 2 tris
    assert np.allclose(v[..., 2], 0.5)
    assert v[..., 0].min() == -1.0 and v[..., 0].max() == 1.0
    assert v[..., 1].min() == -1.0 and v[..., 1].max() == 1.0
    assert np.allclose(n, [0, 0, 1])
    assert uv.min() == 0.0 and uv.max() == 1.0


def test_pow2_resampling():
    # 6x6 -> W-1 rounded to a power of two -> 9x9 (heightfield.cpp:512).
    data = np.zeros((6, 6))
    soup = shp.make_heightfield(data)
    v, _, _, _ = soup.concat()
    assert v.shape[0] == 8 * 8 * 2


def test_ramp_normals_and_scale():
    # z = x ramp: analytic normal (-1, 0, 1)/sqrt(2) everywhere.
    w = 9
    xs = np.linspace(0, 2, w)  # dz/dx in object space: 2 over [-1,1] -> 1
    data = np.tile(xs, (w, 1))
    soup = shp.make_heightfield(data)
    _, n, _, _ = soup.concat()
    expect = np.array([-1.0, 0.0, 1.0]) / np.sqrt(2.0)
    assert np.allclose(n, expect, atol=1e-6)


def test_face_normals_mode():
    data = np.zeros((5, 5))
    data[2, 2] = 0.3
    soup = shp.make_heightfield(data, shading_normals=False)
    v, n, _, _ = soup.concat()
    # Face normals: every triangle's three vertex normals identical.
    assert np.allclose(n[:, 0], n[:, 1]) and np.allclose(n[:, 0], n[:, 2])
    # And all point upward.
    assert (n[..., 2] > 0).all()


def test_heightfield_xml_and_render(tmp_path):
    # A bumpy heightfield lit from above renders without NaNs and hits it.
    from PIL import Image

    img = (np.random.RandomState(0).rand(9, 9) * 255).astype(np.uint8)
    Image.fromarray(img, mode="L").save(tmp_path / "h.png")
    xml = f"""<scene version="0.6.0">
      <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
          <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
        </film>
      </sensor>
      <shape type="heightfield">
        <string name="filename" value="h.png"/>
        <float name="scale" value="0.5"/>
        <bsdf type="diffuse"><spectrum name="reflectance" value="0.7"/></bsdf>
      </shape>
      <emitter type="constant"><spectrum name="radiance" value="1.0"/></emitter>
    </scene>"""
    (tmp_path / "s.xml").write_text(xml)
    from sdmm_tpu.scene.xml_loader import load_scene

    scene, cfg = load_scene(str(tmp_path / "s.xml")).build()
    assert scene.tri_v0.shape[0] == 8 * 8 * 2

    import jax

    from sdmm_tpu.render import intersect as isect

    # Rays straight down onto the field must hit it.
    n = 16
    xs = np.linspace(-0.9, 0.9, n)
    ro = np.stack([xs, np.zeros(n), np.full(n, 3.0)], axis=-1)
    rd = np.tile([0.0, 0.0, -1.0], (n, 1))
    hit = isect.intersect(scene, ro, rd)
    assert bool(np.asarray(hit["valid"]).all())
    z = 3.0 - np.asarray(hit["t"])
    assert (z >= -1e-3).all() and (z <= 0.5 + 1e-3).all()
