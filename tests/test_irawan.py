"""Irawan woven-cloth BRDF tests (bsdf/irawan.py).

Parity model: reference mitsuba/src/bsdfs/irawan.{h,cpp} — weave-DSL
parsing, spatially-varying yarn lookup, cosine sample/pdf consistency,
energy sanity, and the MC specular normalization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.bsdf import irawan as ir


def test_parse_weave_dsl():
    wp = ir.parse_weave(ir.PLAIN_WEAVE)
    assert wp.tile_width == 2 and wp.tile_height == 2
    assert len(wp.yarns) == 4
    assert wp.pattern.shape == (2, 2)
    assert abs(wp.yarns[0]["psi"] - np.deg2rad(30)) < 1e-6
    assert wp.yarns[0]["type"] == "warp"
    assert wp.yarns[1]["type"] == "weft"
    np.testing.assert_allclose(wp.yarns[0]["kd"], [0.45, 0.4, 0.35])


def test_parse_weave_param_substitution():
    text = ir.PLAIN_WEAVE.replace("alpha = 0.3", "alpha = $myAlpha")
    wp = ir.parse_weave(text, {"myAlpha": "0.7"})
    assert abs(wp.alpha - 0.7) < 1e-6


def _tables():
    return ir.build_tables(ir.parse_weave(ir.PLAIN_WEAVE))


def test_eval_nonnegative_and_spatially_varying():
    t = _tables()
    n = 4096
    k = jax.random.PRNGKey(0)
    from sdmm_tpu.core import warp

    wi = warp.square_to_cosine_hemisphere(jax.random.uniform(k, (n, 2)))
    wo = warp.square_to_cosine_hemisphere(
        jax.random.uniform(jax.random.fold_in(k, 1), (n, 2)))
    uv = jax.random.uniform(jax.random.fold_in(k, 2), (n, 2))
    f = np.asarray(ir.eval_irawan(t, uv, wi, wo))
    assert np.isfinite(f).all()
    assert (f >= 0).all()
    assert f.max() > 0
    # Specular highlight varies across the weave: fix directions, vary uv.
    wi1 = jnp.broadcast_to(jnp.asarray([0.3, 0.2, np.sqrt(0.87)]), (n, 3))
    f2 = np.asarray(ir.eval_irawan(t, uv, wi1, wi1))
    assert f2.std() > 1e-4


def test_energy_bounded():
    """White-furnace: cosine-MC integral of f stays below ~1 per channel
    (the reference's normalization bounds the specular peak)."""
    t = _tables()
    n = 200_000
    k = jax.random.PRNGKey(3)
    from sdmm_tpu.core import warp

    wi = jnp.broadcast_to(jnp.asarray([0.4, 0.1, np.sqrt(0.83)]), (n, 3))
    wo = warp.square_to_cosine_hemisphere(jax.random.uniform(k, (n, 2)))
    uv = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
    f = np.asarray(ir.eval_irawan(t, uv, wi, wo))
    cos_o = np.maximum(np.asarray(wo[:, 2]), 1e-6)
    # E[f*cos/pdf] with pdf = cos/pi -> pi*E[f].
    refl = np.pi * (f / cos_o[:, None] * (cos_o[:, None] / np.pi)
                    / (cos_o[:, None] / np.pi)).mean(0)
    assert (refl < 1.5).all(), refl  # kd 0.45 + bounded specular


def test_scene_dispatch_and_render():
    """irawan through the full wavefront dispatch on a lit plane."""
    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.scene.scene import BSDF_IRAWAN, SceneBuilder

    b = SceneBuilder()
    b.irawan_pattern = ir.parse_weave(ir.PLAIN_WEAVE)
    b.irawan_pattern.repeat_u = 10.0
    b.irawan_pattern.repeat_v = 10.0
    cloth = b.add_bsdf(BSDF_IRAWAN)
    rot = np.eye(4)
    a = np.deg2rad(-90.0)
    rot[1:3, 1:3] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    b.add_shape(shp.make_rectangle(rot, False), cloth)
    em = b.add_emitter([8.0, 8.0, 8.0])
    lrot = np.eye(4)
    a = np.deg2rad(90.0)
    lrot[1:3, 1:3] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    lrot[:3, 3] = [0.0, 2.0, 0.0]
    lrot[:3, :3] = lrot[:3, :3] @ np.diag([0.4, 0.4, 1.0])
    b.add_shape(shp.make_rectangle(lrot, False), b.add_bsdf(0, albedo=[0, 0, 0]), em)
    cam = np.eye(4)
    cam[:3, 3] = [0.0, 1.0, 2.5]
    cam[0, 0] = -1.0
    cam[2, 2] = -1.0
    b.set_sensor(cam, 60.0, 24, 24)
    scene, cfg = b.build()
    assert BSDF_IRAWAN in cfg.bsdf_types

    from sdmm_tpu.render.renderer import render

    res = render(scene, cfg, spp=16)
    img = np.asarray(res["image"])
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3


def test_sample_pdf_consistency():
    """Cosine sampling must chi-square match the cosine pdf through the
    dispatch (irawan's sampler, reference irawan.cpp sample)."""
    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.scene.scene import BSDF_IRAWAN
    from sdmm_tpu.utils.chisquare import chi2_test

    t = _tables()
    n = 100_000
    params = {
        "type": jnp.full((n,), BSDF_IRAWAN, jnp.int32),
        "albedo": jnp.full((n, 3), 0.5),
        "specular": jnp.ones((n, 3)),
        "alpha": jnp.full((n,), 0.1),
        "eta": jnp.full((n,), 1.5),
        "k": jnp.ones((n, 3)),
        "exponent": jnp.full((n,), 30.0),
        "alpha_v": jnp.full((n,), 0.1),
        "iw": t,
        "uv": jax.random.uniform(jax.random.PRNGKey(9), (n, 2)),
    }
    wi = jnp.broadcast_to(jnp.asarray([0.3, 0.1, np.sqrt(0.9)]), (n, 3))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    bs = bsdf_mod.sample(params, wi, jax.random.uniform(k1, (n,)),
                         jax.random.uniform(k2, (n, 2)))
    acc = np.asarray(jnp.max(bs["weight"], -1)) > 0
    dirs = np.asarray(bs["wo"])[acc]

    def pdf_fn(d):
        z = np.maximum(np.asarray(d)[:, 2], 0.0)
        return z / np.pi

    passed, p, st = chi2_test(dirs, pdf_fn)
    assert passed, (p, st)
