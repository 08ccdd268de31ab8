import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.render import intersect as isect
from sdmm_tpu.render.renderer import render
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder
from sdmm_tpu.scene import shapes as shp

REF_SCENES = "/root/reference/test-suite/scenes"


def make_box_scene(width=32, height=32):
    """A closed cornell-like box with a ceiling light, built programmatically."""
    b = SceneBuilder()
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.725, 0.71, 0.68])
    red = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.63, 0.065, 0.05])
    green = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.14, 0.45, 0.091])
    black = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.0, 0.0, 0.0])
    em = b.add_emitter([20.0, 20.0, 20.0])

    def rect(to_world, bsdf, emitter=-1, flip=False):
        b.add_shape(shp.make_rectangle(np.asarray(to_world), flip), bsdf, emitter)

    import numpy as _np

    def compose(translate, scale, rx=0.0, ry=0.0):
        m = _np.eye(4)
        m[:3, :3] = _np.diag(scale)
        rxm = _np.eye(4)
        a = _np.deg2rad(rx)
        rxm[1:3, 1:3] = [[_np.cos(a), -_np.sin(a)], [_np.sin(a), _np.cos(a)]]
        rym = _np.eye(4)
        a = _np.deg2rad(ry)
        rym[0, 0] = rym[2, 2] = _np.cos(a)
        rym[0, 2] = _np.sin(a)
        rym[2, 0] = -_np.sin(a)
        out = _np.eye(4)
        out[:3, 3] = translate
        return out @ rym @ rxm @ m

    # Box [-1,1]^2 x [0,2]: floor (z up is +y here) — use y-up convention.
    rect(compose([0, 0, 0], [1, 1, 1], rx=-90), white)  # floor y=0, normal +y
    rect(compose([0, 2, 0], [1, 1, 1], rx=90), white)  # ceiling, normal -y
    rect(compose([0, 1, -1], [1, 1, 1]), white)  # back wall, normal +z
    rect(compose([-1, 1, 0], [1, 1, 1], ry=90), red)  # left wall, normal +x
    rect(compose([1, 1, 0], [1, 1, 1], ry=-90), green)  # right wall, normal -x
    rect(compose([0, 1.98, 0], [0.3, 0.3, 1], rx=90), black, em)  # light

    cam = _np.eye(4)
    cam[:3, 3] = [0.0, 1.0, 4.0]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0  # look along -z
    b.set_sensor(cam, fov_deg=40.0, width=width, height=height)
    b.max_depth = 5
    b.rr_depth = 5
    return b


def test_intersect_basic():
    b = make_box_scene()
    scene, cfg = b.build()
    ro = jnp.array([[0.0, 1.0, 4.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    hit = isect.intersect(scene, ro, rd)
    assert bool(hit["valid"][0])
    # Back wall at z=-1 → t = 5.
    assert abs(float(hit["t"][0]) - 5.0) < 1e-3


def test_occlusion():
    b = make_box_scene()
    scene, cfg = b.build()
    ro = jnp.array([[0.0, 1.0, 0.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    occ = isect.occluded(scene, ro, rd, jnp.array([0.9]))
    assert not bool(occ[0])
    occ2 = isect.occluded(scene, ro, rd, jnp.array([1.5]))
    assert bool(occ2[0])


def test_render_box_nee_vs_bsdf_only():
    """NEE and BSDF-only sampling must agree in expectation (MC consistency)."""
    b = make_box_scene(24, 24)
    scene, cfg = b.build()
    out_nee = render(scene, cfg, spp=64, seed=3, rays_per_wave=24 * 24, nee=True)
    out_pt = render(scene, cfg, spp=512, seed=4, rays_per_wave=24 * 24, nee=False)
    m_nee = out_nee["image"].mean()
    m_pt = out_pt["image"].mean()
    assert m_nee > 0.01
    assert abs(m_nee - m_pt) / m_nee < 0.12, (m_nee, m_pt)


def test_render_energy_reasonable():
    b = make_box_scene(16, 16)
    scene, cfg = b.build()
    out = render(scene, cfg, spp=32, seed=5, rays_per_wave=256, nee=True)
    img = np.asarray(out["image"])
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01
    # Left half should be redder, right half greener (color bleeding).
    left = img[:, : img.shape[1] // 3]
    right = img[:, -img.shape[1] // 3 :]
    assert left[..., 0].mean() > left[..., 2].mean()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_SCENES, "cornell-box/cornell-box.xml")),
    reason="reference test-suite not available",
)
def test_load_reference_cornell_box():
    from sdmm_tpu.scene.xml_loader import load_scene

    builder = load_scene(
        os.path.join(REF_SCENES, "cornell-box/cornell-box.xml"),
        overrides={"integrator": "gt", "samplesPerIteration": 4, "nee": "true"},
    )
    scene, cfg = builder.build()
    assert scene.tri_v0.shape[0] > 20  # walls + boxes + light
    assert scene.em_tri_idx.shape[0] == 2  # light rectangle = 2 triangles
    assert cfg.width == 640 and cfg.height == 360
    # Render a tiny crop to check energy flows.
    cfg.width, cfg.height = 64, 36
    out = render(scene, cfg, spp=8, seed=1, rays_per_wave=64 * 36)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    assert img.mean() > 0.05, img.mean()


def test_textured_albedo():
    """Checkerboard texture modulates diffuse albedo across a quad."""
    import numpy as _np
    from sdmm_tpu.scene.scene import SceneBuilder as SB, BSDF_DIFFUSE as DIFF
    from sdmm_tpu.scene import shapes as _shp
    from sdmm_tpu.render.renderer import render as _render

    b = SB()
    # 2x2 checker: white / black quadrants.
    checker = _np.indices((8, 8)).sum(0) % 2
    tex = b.add_texture(_np.repeat(checker[..., None], 3, -1).astype(_np.float32))
    mat = b.add_bsdf(DIFF, albedo=[1.0, 0.0, 0.0], tex=tex)
    m = _np.eye(4)  # quad in xy-plane facing +z
    b.add_shape(_shp.make_rectangle(m), mat)
    b.env_radiance = _np.ones(3)  # uniform sky illumination
    cam = _np.eye(4)
    cam[:3, 3] = [0.0, 0.0, 3.0]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0
    b.set_sensor(cam, fov_deg=40.0, width=32, height=32)
    b.max_depth = 2
    b.rr_depth = 2
    scene, cfg = b.build()
    assert int(scene.bsdf_tex[mat]) == tex
    out = _render(scene, cfg, spp=32, seed=0, rays_per_wave=1024, nee=False)
    img = np.asarray(out["image"])
    center = img[4:28, 4:28]
    # Texture overrides the red base: gray checker → channels roughly equal.
    assert abs(center[..., 0].mean() - center[..., 1].mean()) < 0.05
    # Strong spatial variation from the checker pattern.
    lum = center.mean(-1)
    assert lum.std() > 0.15 * lum.mean(), (lum.mean(), lum.std())


def test_disk_cylinder_hair_shapes(tmp_path):
    # Disk: area of the unit disk tessellation ≈ pi.
    disk = shp.make_disk(np.eye(4))
    tris = disk.concat()[0]
    area = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    ).sum()
    assert abs(area - np.pi) < 0.02 * np.pi

    # Cylinder: lateral area ≈ 2*pi*r*h, normals unit and radial.
    cyl = shp.make_cylinder(np.zeros(3), np.array([0, 0, 2.0]), 0.5)
    tris, ns, _, _ = cyl.concat()
    area = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    ).sum()
    assert abs(area - 2 * np.pi * 0.5 * 2.0) < 0.05 * 2 * np.pi
    assert np.allclose(np.linalg.norm(ns, axis=-1), 1.0, atol=1e-6)
    assert np.max(np.abs(ns[..., 2])) < 1e-6

    # Hair: text format, two fibers -> segments of cylinders.
    hf = tmp_path / "strands.hair"
    hf.write_text("0 0 0\n0 0 1\n0 0 2\n\n1 0 0\n1 0 1\n")
    soup = shp.load_hair(str(hf), radius=0.01)
    tris, ns, _, _ = soup.concat()
    assert len(tris) > 0
    assert np.all(np.isfinite(tris))

    # Hair: binary format round-trip.
    import struct

    pts = [(0, 0, 0), (0, 0, 1), (float("inf"), 0, 0), (1, 0, 0), (1, 0, 1)]
    bf = tmp_path / "strands.bin"
    with open(bf, "wb") as f:
        f.write(b"BINARY_HAIR")
        f.write(struct.pack("<I", len(pts)))
        for v in pts:
            f.write(struct.pack("<3f", *v))
    soup2 = shp.load_hair(str(bf), radius=0.01)
    # Text fiber 1 is collinear -> simplified to one segment; both files
    # then contain exactly two segments.
    assert len(soup2.concat()[0]) == len(tris)
    seg_tris = len(
        shp.make_cylinder(np.zeros(3), np.array([0, 0, 1.0]), 0.01, n_phi=4).concat()[0]
    )
    assert len(tris) == 2 * seg_tris
