"""Hosek-Wilkie sky + Preetham sun (scene/sunsky.py).

Reference: mitsuba/src/emitters/{sky,sun}.cpp + sunsky/skymodel.cpp.
The strongest gates are dataset-endpoint identities: at integer turbidity,
albedo in {0,1} and solar elevation 0 or pi/2 the quintic-Bezier /
bilinear blend must return raw dataset rows exactly.
"""

import numpy as np

from sdmm_tpu.scene import sunsky as ss


def test_hosek_state_dataset_endpoints():
    d = ss._data()
    cfg = d["config"]  # [3, 2, 10, 6, 9]
    rad = d["radiance"]  # [3, 2, 10, 6]
    # turbidity 4 (int -> it=4, rem 0 -> row it-1=3), albedo 0,
    # elevation pi/2 -> x=1 -> Bezier returns control point 5.
    configs, radiances = ss.hosek_state(4.0, 0.0, np.pi / 2)
    np.testing.assert_allclose(configs, cfg[:, 0, 3, 5, :], rtol=1e-12)
    np.testing.assert_allclose(radiances, rad[:, 0, 3, 5], rtol=1e-12)
    # elevation 0 -> control point 0; albedo 1 -> albedo-1 table.
    configs, radiances = ss.hosek_state(7.0, 1.0, 0.0)
    np.testing.assert_allclose(configs, cfg[:, 1, 6, 0, :], rtol=1e-12)
    np.testing.assert_allclose(radiances, rad[:, 1, 6, 0], rtol=1e-12)
    # Fractional turbidity interpolates linearly between rows.
    c_mid, r_mid = ss.hosek_state(4.5, 0.0, np.pi / 2)
    np.testing.assert_allclose(
        c_mid, 0.5 * (cfg[:, 0, 3, 5, :] + cfg[:, 0, 4, 5, :]), rtol=1e-9
    )
    np.testing.assert_allclose(
        r_mid, 0.5 * (rad[:, 0, 3, 5] + rad[:, 0, 4, 5]), rtol=1e-9
    )


def test_sky_radiance_positive_and_sun_peaked():
    configs, radiances = ss.hosek_state(3.0, 0.2, np.deg2rad(40.0))
    theta = np.full((5,), np.deg2rad(50.0))  # sun zenith angle
    gamma = np.deg2rad(np.array([2.0, 10.0, 40.0, 90.0, 140.0]))
    vals = ss.hosek_radiance(configs, radiances, theta, gamma)
    assert (vals > 0).all()
    lum = vals.mean(axis=-1)
    # Monotone circumsolar decay and a strong forward peak. Thresholds
    # hand-checked against GetRadianceInternal at turbidity 3 / albedo 0.2:
    # mean-luminance ratio gamma=2deg vs 40deg is ~2.65 (blue channel is
    # flat), vs 90deg ~3.7. The anisotropy sits at configs[:, 8] ~ 0.66-0.70.
    assert np.allclose(configs[:, 8], 0.68, atol=0.03), configs[:, 8]
    assert lum[0] > 2.0 * lum[2], lum
    assert lum[0] > 3.0 * lum[3], lum
    assert lum[0] > lum[1] > lum[2] > lum[3], lum
    assert lum[0] > lum[-1], lum


def test_sun_radiance_turbidity_attenuates():
    lo = ss.compute_sun_radiance_rgb(np.deg2rad(30.0), 2.0)
    hi = ss.compute_sun_radiance_rgb(np.deg2rad(30.0), 8.0)
    assert (lo > 0).all() and (hi > 0).all()
    assert (hi < lo).all()
    # Low sun is dimmer and redder than high sun.
    horizon = ss.compute_sun_radiance_rgb(np.deg2rad(88.0), 2.0)
    assert horizon.sum() < lo.sum()
    assert horizon[0] / max(horizon[2], 1e-9) > lo[0] / lo[2]


def test_sun_disc_power_resolution_independent():
    """The QMC disc rasterization conserves power: integral(L dOmega) =
    disc radiance x disc solid angle at any envmap resolution
    (the failure mode sun.cpp:169-177 calls out)."""
    sun_dir = np.array([0.3, 0.8, 0.2])
    sun_dir /= np.linalg.norm(sun_dir)
    theta_s = np.arccos(sun_dir[1])
    expected = (
        ss.compute_sun_radiance_rgb(theta_s, 3.0)
        * 2.0 * np.pi * (1.0 - np.cos(ss.SUN_ANGULAR_RADIUS))
    )
    for res in (128, 512):
        env = ss.make_sunsky_envmap(
            sun_dir, turbidity=3.0, resolution=res,
            with_sky=False, with_sun=True,
        )
        he, we = env.shape[:2]
        theta = (np.arange(he) + 0.5) / he * np.pi
        d_omega = (np.pi / he) * (2 * np.pi / we) * np.sin(theta)
        power = (env * d_omega[:, None, None]).sum(axis=(0, 1))
        np.testing.assert_allclose(power, expected, rtol=0.02)


def test_sunsky_envmap_character():
    """Sun disc visible and far brighter than the sky; sky black below the
    horizon; horizon brighter than zenith (classic Hosek character)."""
    sun_dir = np.array([0.2, 0.7, -0.6])
    env = ss.make_sunsky_envmap(sun_dir, turbidity=3.0, resolution=128)
    he, we = env.shape[:2]
    lum = env.mean(axis=-1)
    sky_median = np.median(lum[: he // 2][lum[: he // 2] > 0])
    assert lum.max() > 100.0 * sky_median
    # Below horizon: black.
    assert lum[int(he * 0.55):].max() == 0.0
    # Horizon row brighter than zenith row (away from the sun column).
    zenith = lum[1].mean()
    horizon = lum[int(he * 0.47)].mean()
    assert horizon > zenith


def test_sun_coordinates_tokyo():
    # Reference defaults: Tokyo, 2010-07-10 15:00 JST -> sun well above
    # the horizon, afternoon azimuth (west of south).
    zen, az = ss.compute_sun_coordinates()
    assert 0.0 < zen < np.deg2rad(70.0)
    # Midnight: below the horizon.
    zen2, _ = ss.compute_sun_coordinates(hour=0.0)
    assert zen2 > np.deg2rad(90.0)
    d = ss.sun_coords_to_dir(zen, az)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-6)
    assert d[1] > 0.3  # up component


def test_xml_sunsky_loads():
    import os
    import tempfile

    from sdmm_tpu.scene.xml_loader import load_scene

    xml = """<scene version="0.6.0">
      <emitter type="sunsky">
        <float name="turbidity" value="4"/>
        <vector name="sunDirection" x="0.2" y="0.8" z="0.3"/>
        <integer name="resolution" value="64"/>
      </emitter>
      <shape type="rectangle"/>
      <sensor type="perspective">
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
    assert builder.env_map is not None
    assert builder.env_map.shape == (64, 128, 3)
    scene, cfg = builder.build()
    # Envmap NEE tables built (sun importance-sampled).
    assert scene.env_pdf.shape[0] > 1
