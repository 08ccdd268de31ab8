"""Dipole subsurface scattering (render/subsurface.py).

Reference: mitsuba/src/subsurface/dipole.cpp. The analytic gate uses the
classic closed form of the dipole's total diffuse reflectance: for
R_d(r) = alpha' * dMo(r), the plane integral is
    R = alpha'/2 * (1 + e^{-(4/3) A sqrt(3(1-alpha'))}) e^{-sqrt(3(1-alpha'))}
(Jensen et al. 2001, eq. 9), so integral(dMo dA) = R / alpha'. A uniformly
lit plane (constant environment L) has E = pi*L everywhere, hence the baked
exitance at interior points must equal pi*L*R/alpha'.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")

import sdmm_tpu.scene.shapes as shp  # noqa: E402
from sdmm_tpu.render import subsurface as sss  # noqa: E402
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder  # noqa: E402

PARAMS = {
    # mfp ~ 0.12 scene units: the 8x8 plane then needs ~30k bake points
    # (spacing must stay well under the mfp; see sample_surface_points).
    "sigma_s": np.array([8.0, 8.0, 8.0]),
    "sigma_a": np.array([0.12, 0.24, 0.48]),
    "g": np.zeros(3),
    "eta": 1.3,
    "irr_samples": 4,
}


def _analytic_plane_integral(params):
    """integral of dMo over the infinite plane = R/alpha' (see module doc)."""
    sigma_sp = params["sigma_s"] * (1.0 - params["g"])
    sigma_tp = sigma_sp + params["sigma_a"]
    alpha_p = sigma_sp / sigma_tp
    fdr = sss._fresnel_diffuse_reflectance(1.0 / params["eta"])
    a_const = (1.0 + fdr) / (1.0 - fdr)
    s = np.sqrt(3.0 * (1.0 - alpha_p))
    return 0.5 * (1.0 + np.exp(-4.0 / 3.0 * a_const * s)) * np.exp(-s)


def test_dmo_plane_integral_matches_closed_form():
    co = sss.dipole_coeffs(PARAMS)
    # Radial numeric integration of dMo * 2 pi r dr.
    r = np.linspace(1e-5, 60.0 * co["radius"], 400000)
    dr = r[1] - r[0]
    import jax.numpy as jnp

    vals = np.asarray(
        sss.dmo(jnp.asarray(r * r),
                jnp.asarray(co["zr"]), jnp.asarray(co["zv"]),
                jnp.asarray(co["sigma_tr"]))
    )
    numeric = (vals * (2.0 * np.pi * r * dr)[:, None]).sum(axis=0)
    analytic = _analytic_plane_integral(PARAMS)
    np.testing.assert_allclose(numeric, analytic, rtol=0.02)


def _plane_scene(side=4.0, n_grid=8):
    """Tessellated plane: per-corner baking needs interior vertices (the
    same resolution requirement as any vertex-baked attribute)."""
    b = SceneBuilder()
    black = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.0, 0.0, 0.0])
    s_id = b.add_subsurface(**PARAMS)
    cell = 2.0 * side / n_grid
    for iy in range(n_grid):
        for ix in range(n_grid):
            m = np.diag([cell / 2.0, cell / 2.0, 1.0, 1.0])
            m[0, 3] = -side + (ix + 0.5) * cell
            m[1, 3] = -side + (iy + 0.5) * cell
            b.add_shape(shp.make_rectangle(m, False), black, sss=s_id)
    b.env_radiance = np.array([1.0, 1.0, 1.0])
    cam = np.eye(4)
    cam[:3, 3] = [0.0, 0.0, 3.0]
    cam[2, 2] = -1.0  # look down -z toward the plane at z=0
    b.set_sensor(cam, 60.0, 24, 24)
    return b.build()


def test_plane_bake_matches_analytic():
    scene, cfg = _plane_scene()
    assert cfg.has_sss
    baked = sss.bake_subsurface(scene, cfg, seed=3)
    m = np.asarray(baked.sss_M)  # [T, 3, 3]
    # Interior corners (away from the plane edge by >> diffusion length):
    # corner positions
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # [T, 3, 3]
    interior = np.abs(corners[..., :2]).max(axis=-1) < 1.5  # [T, 3]
    expected = np.pi * _analytic_plane_integral(PARAMS)  # E = pi * L, L = 1
    vals = m[interior]  # [K, 3]
    assert vals.shape[0] > 0
    # Point-set + finite-plane approximation: 12% tolerance.
    np.testing.assert_allclose(vals.mean(axis=0), expected, rtol=0.12)


def test_render_pure_sss_image():
    """A black-BSDF plane with subsurface under a constant environment:
    pixel values must equal INV_PI*(1-Fr(cos))*M (no other light path)."""
    from sdmm_tpu.bsdf.fresnel import fresnel_dielectric
    from sdmm_tpu.render.renderer import render

    scene, cfg = _plane_scene()
    out = render(scene, cfg, spp=8, seed=5)
    img = out["image"]
    # Center pixel: viewing direction ~ straight down, cos ~ 1.
    c = img[img.shape[0] // 2, img.shape[1] // 2]
    m_expect = np.pi * _analytic_plane_integral(PARAMS)
    fr = float(fresnel_dielectric(np.float32(1.0), np.float32(1.3))[0])
    expected = (1.0 / np.pi) * (1.0 - fr) * m_expect
    np.testing.assert_allclose(c, expected, rtol=0.15)
    # The plane's own BSDF is black: remove sss and the image is dark.
    assert img.max() > 0.01


def test_xml_subsurface_parses():
    import os
    import tempfile

    from sdmm_tpu.scene.xml_loader import load_scene

    xml = """<scene version="0.6.0">
      <shape type="rectangle">
        <subsurface type="dipole">
          <string name="material" value="marble"/>
          <integer name="irrSamples" value="2"/>
        </subsurface>
        <bsdf type="diffuse"><rgb name="reflectance" value="0,0,0"/></bsdf>
      </shape>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
    </scene>"""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.xml")
        with open(path, "w") as f:
            f.write(xml)
        builder = load_scene(path)
    scene, cfg = builder.build()
    assert cfg.has_sss
    assert len(cfg.sss) == 1
    # Marble preset, x100 scale (reference materials.h:128).
    np.testing.assert_allclose(
        cfg.sss[0]["sigma_s"], np.array([2.19, 2.62, 3.00]) * 100.0
    )
    assert cfg.sss[0]["eta"] == 1.5
    assert int(np.asarray(scene.tri_sss).max()) == 0
