"""Point lights, sensor variants, samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.core.sampler import camera_jitter, radical_inverse
from sdmm_tpu.render.renderer import render
from sdmm_tpu.scene.scene import BSDF_DIFFUSE, SceneBuilder
from sdmm_tpu.scene import shapes as shp
from sdmm_tpu.scene.sensor import generate_rays


def point_light_scene():
    """A diffuse floor lit by a single point light."""
    b = SceneBuilder()
    white = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.8, 0.8, 0.8])
    floor = np.eye(4)
    floor[:3, :3] = np.array([[2, 0, 0], [0, 0, 2], [0, -2, 0]]).T  # z→ -y? build flat
    import numpy as _np

    m = _np.eye(4)
    a = _np.deg2rad(-90)
    m[1:3, 1:3] = [[_np.cos(a), -_np.sin(a)], [_np.sin(a), _np.cos(a)]]
    m[:3, :3] = m[:3, :3] @ _np.diag([2.0, 2.0, 1.0])
    b.add_shape(shp.make_rectangle(m), white)  # floor at y=0, normal +y
    b.add_point_light([0.0, 1.5, 0.0], [4.0, 4.0, 4.0])
    cam = _np.eye(4)
    cam[:3, 3] = [0.0, 1.0, 3.0]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0
    b.set_sensor(cam, fov_deg=50.0, width=24, height=24)
    b.max_depth = 2
    b.rr_depth = 2
    return b.build()


def test_point_light_illumination():
    scene, cfg = point_light_scene()
    out = render(scene, cfg, spp=32, seed=0, rays_per_wave=24 * 24, nee=True)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # light reaches the floor
    # Inverse-square + cosine: center of floor brighter than edges.
    h, w, _ = img.shape
    center = img[h // 2 :, w // 3 : 2 * w // 3].mean()
    edge = img[h // 2 :, : w // 6].mean()
    assert center > edge, (center, edge)


def test_point_light_analytic_value():
    """Direct lighting from a point light has a closed form: L = albedo/pi *
    I * cos(theta) / r^2."""
    scene, cfg = point_light_scene()
    out = render(scene, cfg, spp=128, seed=1, rays_per_wave=24 * 24, nee=True)
    img = np.asarray(out["image"])
    # Pixel at image center looks at floor point roughly below the camera
    # axis; instead validate the brightest direct value ~ albedo/pi * I/r²
    # at the point directly under the light (r=1.5, cos=1).
    expected = 0.8 / np.pi * 4.0 / (1.5**2)
    direct_max = img[..., 0].max()
    # MC render includes indirect (small here) — brightest pixel should be
    # within a factor ~2 of the analytic direct value.
    assert 0.5 * expected < direct_max < 3.0 * expected, (direct_max, expected)


def test_radical_inverse_base2():
    idx = jnp.arange(8)
    ri = np.asarray(radical_inverse(idx, 2))
    np.testing.assert_allclose(ri, [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-6)


def test_stratified_sampler_reduces_variance():
    scene, cfg = point_light_scene()
    outs = {}
    for sampler in ("independent", "stratified"):
        res = render(scene, cfg, spp=16, seed=3, rays_per_wave=24 * 24,
                     nee=True, sampler=sampler)
        outs[sampler] = np.asarray(res["image"])
    # Both estimates agree in mean.
    a, b = outs["independent"].mean(), outs["stratified"].mean()
    assert abs(a - b) / a < 0.1, (a, b)


def test_sensor_variants_produce_rays():
    scene, cfg = point_light_scene()
    pix = jnp.stack([jnp.full((16,), 12.0), jnp.full((16,), 12.0)], axis=-1)
    for st, kw in [
        ("perspective", {}),
        ("orthographic", {"ortho_scale": 2.0}),
        ("spherical", {}),
        ("thinlens", {"aperture": 0.1, "focus_dist": 3.0,
                      "lens_uv": jnp.full((16, 2), 0.3)}),
    ]:
        ro, rd = generate_rays(scene, pix, 24, 24, sensor_type=st, **kw)
        assert np.isfinite(np.asarray(ro)).all()
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(rd, axis=-1)), 1.0, atol=1e-5
        )


def test_spot_light_cone():
    """Spot light illuminates only inside its cone."""
    import numpy as _np
    from sdmm_tpu.scene.scene import SceneBuilder as SB, BSDF_DIFFUSE as DIFF
    from sdmm_tpu.scene import shapes as _shp

    b = SB()
    white = b.add_bsdf(DIFF, albedo=[0.8, 0.8, 0.8])
    m = _np.eye(4)
    a = _np.deg2rad(-90)
    m[1:3, 1:3] = [[_np.cos(a), -_np.sin(a)], [_np.sin(a), _np.cos(a)]]
    m[:3, :3] = m[:3, :3] @ _np.diag([3.0, 3.0, 1.0])
    b.add_shape(_shp.make_rectangle(m), white)  # floor y=0
    # Narrow spot pointing straight down from y=2.
    b.add_spot_light([0.0, 2.0, 0.0], [0.0, -1.0, 0.0], [8.0, 8.0, 8.0],
                     cutoff_deg=15.0, beam_deg=10.0)
    cam = _np.eye(4)
    cam[:3, 3] = [0.0, 1.5, 3.5]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0
    b.set_sensor(cam, fov_deg=50.0, width=32, height=32)
    b.max_depth = 2
    b.rr_depth = 2
    scene, cfg = b.build()
    out = render(scene, cfg, spp=32, seed=2, rays_per_wave=1024, nee=True)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    # Bright disk under the light; dark floor far from the axis.
    bright = img[img[..., 0] > 0.05]
    assert len(bright) > 5  # spot creates a lit region
    # Cone radius at floor = 2·tan(15°) ≈ 0.54 — most of the 3-unit floor
    # stays dark: lit fraction well below half.
    lit_frac = (img[..., 0] > 0.05).mean()
    assert lit_frac < 0.4, lit_frac


def test_directional_light():
    import numpy as _np
    from sdmm_tpu.scene.scene import SceneBuilder as SB, BSDF_DIFFUSE as DIFF
    from sdmm_tpu.scene import shapes as _shp

    b = SB()
    white = b.add_bsdf(DIFF, albedo=[0.6, 0.6, 0.6])
    m = _np.eye(4)
    a = _np.deg2rad(-90)
    m[1:3, 1:3] = [[_np.cos(a), -_np.sin(a)], [_np.sin(a), _np.cos(a)]]
    m[:3, :3] = m[:3, :3] @ _np.diag([2.0, 2.0, 1.0])
    b.add_shape(_shp.make_rectangle(m), white)
    b.add_directional_light([0.0, -1.0, 0.0], [2.0, 2.0, 2.0])  # straight down
    cam = _np.eye(4)
    cam[:3, 3] = [0.0, 1.0, 3.0]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0
    b.set_sensor(cam, fov_deg=45.0, width=16, height=16)
    b.max_depth = 2
    b.rr_depth = 2
    scene, cfg = b.build()
    out = render(scene, cfg, spp=64, seed=3, rays_per_wave=256, nee=True)
    img = np.asarray(out["image"])
    # Direct value: albedo/pi · E · cos(0) = 0.6/pi·2 ≈ 0.382.
    expected = 0.6 / np.pi * 2.0
    floor = img[img[..., 0] > 0.01][..., 0]
    assert len(floor) > 20
    assert abs(np.median(floor) - expected) / expected < 0.15, (
        np.median(floor), expected)


def test_image_envmap_directional_colors():
    """Equirect envmap lookup: sky blue above, ground green below."""
    import numpy as _np
    from sdmm_tpu.scene.scene import SceneBuilder as SB, BSDF_DIFFUSE as DIFF
    from sdmm_tpu.scene import emitters as _em

    b = SB()
    b.add_bsdf(DIFF)
    env = _np.zeros((8, 16, 3), _np.float32)
    env[:4] = [0.1, 0.2, 1.0]  # top half (y > 0): blue
    env[4:] = [0.1, 1.0, 0.2]  # bottom: green
    b.env_map = env
    b.env_radiance = _np.ones(3)
    b.set_sensor(_np.eye(4), fov_deg=40.0, width=8, height=8)
    scene, cfg = b.build()
    import jax.numpy as _jnp

    up = _em.env_eval(scene, _jnp.asarray([[0.0, 1.0, 0.0]]))
    down = _em.env_eval(scene, _jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(up[0, 2]) > 0.8 and float(up[0, 1]) < 0.5
    assert float(down[0, 1]) > 0.8 and float(down[0, 2]) < 0.5


def test_gaussian_rfilter_smooths():
    scene, cfg = point_light_scene()
    box = render(scene, cfg, spp=8, seed=7, rays_per_wave=24 * 24, rfilter="box")
    gauss = render(scene, cfg, spp=8, seed=7, rays_per_wave=24 * 24,
                   rfilter="gaussian")
    ib, ig = np.asarray(box["image"]), np.asarray(gauss["image"])
    # Same energy, lower high-frequency content.
    assert abs(ib.mean() - ig.mean()) / max(ib.mean(), 1e-9) < 0.05
    def hf(x):
        return np.abs(np.diff(x.mean(-1), axis=1)).mean()
    assert hf(ig) < hf(ib), (hf(ib), hf(ig))
