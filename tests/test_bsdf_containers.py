"""Container BSDF tests: blend and mask (reference: bsdfs/{blendbsdf,mask}.cpp).

Checks chi-square sample↔pdf consistency of the resolved containers and
end-to-end unbiasedness: a 50/50 blend of two diffuse albedos must render
identically to a single diffuse with the averaged albedo; a mask with
opacity o over diffuse must equal o·diffuse + (1-o)·pass-through.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu import bsdf as bsdf_mod
from sdmm_tpu.scene.scene import (
    BSDF_BLEND,
    BSDF_DIFFUSE,
    BSDF_MASK,
    BSDF_PHONG,
    BSDF_ROUGHCONDUCTOR,
    SceneBuilder,
)
from sdmm_tpu.scene.shapes import make_rectangle
from sdmm_tpu.utils.chisquare import chi2_test


def _blend_scene(w=0.3):
    b = SceneBuilder()
    c0 = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.8, 0.2, 0.2])
    c1 = b.add_bsdf(BSDF_ROUGHCONDUCTOR, alpha=0.3)
    blend = b.add_bsdf(BSDF_BLEND, child0=c0, child1=c1, weight=w)
    b.add_shape(make_rectangle(np.eye(4)), blend)
    look = np.eye(4)
    look[:3, 3] = [0, 0, 3]
    look[2, 2] = -1
    b.set_sensor(look, 40.0, 24, 24)
    b.add_emitter(np.full(3, 5.0))
    em = len(b.emitters) - 1
    top = np.eye(4)
    top[:3, 3] = [0, 0, 2.5]
    top[1, 1] = -1  # face down
    b.add_shape(make_rectangle(top), b.add_bsdf(BSDF_DIFFUSE), emitter=em)
    return b


def _params_from_scene(scene, idx, n, types):
    bi = jnp.full((n,), idx, dtype=jnp.int32)
    return bsdf_mod.gather_params(scene, bi, None, types=types)


def test_blend_chi2():
    b = _blend_scene(0.35)
    scene, cfg = b.build()
    types = cfg.bsdf_types
    n = 200_000
    params = _params_from_scene(scene, 2, n, types)  # the blend row
    wi = jnp.asarray([0.4, 0.1, np.sqrt(1 - 0.17)], dtype=jnp.float32)
    wi = wi / jnp.linalg.norm(wi)
    wi_b = jnp.broadcast_to(wi, (n, 3))
    k = jax.random.PRNGKey(0)
    u0 = jax.random.uniform(k, (n,))
    u1 = jax.random.uniform(jax.random.fold_in(k, 1), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(k, 2), (n, 2))
    bs = bsdf_mod.sample_full(params, wi_b, u0, u1, u2, types=types)
    w = np.asarray(jnp.max(bs["weight"], axis=-1))
    accepted = (w > 0) & ~np.asarray(bs["delta"])
    dirs = np.asarray(bs["wo"])[accepted]

    p1 = _params_from_scene(scene, 2, 1, types)

    def pdf_fn(d):
        d = jnp.asarray(d, dtype=jnp.float32)
        m = d.shape[0]

        def bc(v):
            return jnp.broadcast_to(v, (m,) + v.shape[1:])

        p = {kk: (bc(v) if isinstance(v, jnp.ndarray) else
                  {k2: bc(v2) for k2, v2 in v.items()})
             for kk, v in p1.items()}
        _, pdf = bsdf_mod.eval_pdf_full(p, jnp.broadcast_to(wi, (m, 3)), d,
                                        types=types)
        return np.asarray(pdf)

    passed, p_value, st = chi2_test(dirs, pdf_fn)
    assert passed, (p_value, st)


def test_blend_render_matches_average():
    """Blend(diffuse A, diffuse B, w) == diffuse((1-w)A + wB) in expectation."""
    from sdmm_tpu.render.renderer import render

    w = 0.4
    a0 = np.array([0.9, 0.1, 0.3])
    a1 = np.array([0.2, 0.7, 0.8])

    def build(mix):
        b = SceneBuilder()
        if mix:
            c0 = b.add_bsdf(BSDF_DIFFUSE, albedo=a0)
            c1 = b.add_bsdf(BSDF_DIFFUSE, albedo=a1)
            mat = b.add_bsdf(BSDF_BLEND, child0=c0, child1=c1, weight=w)
        else:
            mat = b.add_bsdf(BSDF_DIFFUSE, albedo=(1 - w) * a0 + w * a1)
        b.add_shape(make_rectangle(np.eye(4)), mat)
        em = b.add_emitter(np.full(3, 4.0))
        top = np.eye(4)
        top[:3, 3] = [0, 0, 2.5]
        top[1, 1] = -1
        b.add_shape(make_rectangle(top), b.add_bsdf(BSDF_DIFFUSE), emitter=em)
        look = np.eye(4)
        look[:3, 3] = [0, 0, 3]
        look[2, 2] = -1
        b.set_sensor(look, 40.0, 16, 16)
        return b.build()

    s_mix, c_mix = build(True)
    s_avg, c_avg = build(False)
    c_mix.max_depth = c_avg.max_depth = 3
    img_mix = np.asarray(render(s_mix, c_mix, spp=196, seed=5)["image"])
    img_avg = np.asarray(render(s_avg, c_avg, spp=196, seed=9)["image"])
    np.testing.assert_allclose(img_mix.mean(axis=(0, 1)),
                               img_avg.mean(axis=(0, 1)), rtol=0.05)


def test_mask_render_scales_by_opacity():
    """A fully lit masked diffuse floor: radiance from the surface scales by
    opacity, the rest passes straight through to the background."""
    from sdmm_tpu.render.renderer import render

    op = 0.6

    def build(masked):
        b = SceneBuilder()
        if masked:
            c = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.7, 0.7, 0.7])
            mat = b.add_bsdf(BSDF_MASK, child0=c, albedo=np.full(3, op))
        else:
            mat = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.7, 0.7, 0.7])
        b.add_shape(make_rectangle(np.eye(4)), mat)
        b.env_radiance = np.full(3, 1.0)
        look = np.eye(4)
        look[:3, 3] = [0, 0, 3]
        look[2, 2] = -1
        b.set_sensor(look, 30.0, 16, 16)
        return b.build()

    s_m, c_m = build(True)
    s_p, c_p = build(False)
    c_m.max_depth = c_p.max_depth = 3
    img_m = np.asarray(render(s_m, c_m, spp=256, seed=1, nee=False)["image"])
    img_p = np.asarray(render(s_p, c_p, spp=256, seed=2, nee=False)["image"])
    # Expected: op·(diffuse appearance) + (1-op)·(env seen straight through).
    expect = op * img_p.mean() + (1 - op) * 1.0
    got = img_m.mean()
    assert abs(got - expect) / expect < 0.05, (got, expect)
