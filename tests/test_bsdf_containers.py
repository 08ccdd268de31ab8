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


def test_roughdiffuse_sigma0_is_lambert():
    """Oren-Nayar with sigma=0 must equal plain diffuse."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.scene.scene import BSDF_DIFFUSE, BSDF_ROUGHDIFFUSE

    n = 4096
    key = jax.random.PRNGKey(0)
    from sdmm_tpu.core import warp

    wo = warp.square_to_cosine_hemisphere(jax.random.uniform(key, (n, 2)))
    wi = jnp.broadcast_to(jnp.asarray([0.4, 0.2, np.sqrt(1 - 0.2)]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)

    def params(t, alpha):
        return {
            "type": jnp.full((n,), t, jnp.int32),
            "albedo": jnp.tile(jnp.asarray([0.6, 0.5, 0.4]), (n, 1)),
            "specular": jnp.ones((n, 3)), "alpha": jnp.full((n,), alpha),
            "eta": jnp.full((n,), 1.5), "k": jnp.ones((n, 3)),
            "exponent": jnp.full((n,), 30.0), "alpha_v": jnp.full((n,), alpha),
        }

    f_on, _ = bsdf_mod.eval_pdf(params(BSDF_ROUGHDIFFUSE, 0.0), wi, wo)
    f_d, _ = bsdf_mod.eval_pdf(params(BSDF_DIFFUSE, 0.0), wi, wo)
    assert np.allclose(np.asarray(f_on), np.asarray(f_d), atol=1e-6)
    # Retro-reflection (wo = wi) is brighter than the azimuth-opposed
    # direction at equal polar angle — the Oren-Nayar signature.
    wo_opp = wi * jnp.asarray([-1.0, -1.0, 1.0])
    f_retro, _ = bsdf_mod.eval_pdf(params(BSDF_ROUGHDIFFUSE, 0.5), wi, wi)
    f_opp, _ = bsdf_mod.eval_pdf(params(BSDF_ROUGHDIFFUSE, 0.5), wi, wo_opp)
    assert float(f_retro.mean()) > float(f_opp.mean()) * 1.02


def test_mixturebsdf_and_normalmap_load(tmp_path):
    """mixturebsdf maps onto the blend container; normalmap perturbs ns."""
    import numpy as np
    from PIL import Image

    from sdmm_tpu.scene.xml_loader import load_scene

    # Normal map: constant tangent-space normal tilted in +u.
    nm = np.zeros((8, 8, 3), np.uint8)
    nm[..., 0] = 200  # x ~ +0.57
    nm[..., 1] = 128
    nm[..., 2] = 230  # z ~ +0.8
    Image.fromarray(nm).save(tmp_path / "nm.png")
    xml = """<scene version="0.6.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
      <shape type="rectangle">
        <bsdf type="mixturebsdf">
          <string name="weights" value="0.7, 0.3"/>
          <bsdf type="diffuse"/>
          <bsdf type="roughconductor"><float name="alpha" value="0.2"/></bsdf>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <bsdf type="normalmap">
          <texture type="bitmap"><string name="filename" value="nm.png"/></texture>
          <bsdf type="diffuse"/>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <bsdf type="roughdiffuse"><float name="alpha" value="0.3"/></bsdf>
      </shape>
      <shape type="rectangle">
        <bsdf type="difftrans"/>
      </shape>
    </scene>"""
    (tmp_path / "s.xml").write_text(xml)
    b = load_scene(str(tmp_path / "s.xml"))
    scene, cfg = b.build()
    from sdmm_tpu.scene.scene import (
        BSDF_BLEND, BSDF_DIFFTRANS, BSDF_ROUGHDIFFUSE,
    )

    types = [d["type"] for d in b.bsdfs]
    assert BSDF_BLEND in types
    assert BSDF_ROUGHDIFFUSE in types
    assert BSDF_DIFFTRANS in types
    assert cfg.has_bump  # normalmap uses the bump pipeline
    assert any(d.get("bump", -1) <= -2 for d in b.bsdfs)

    # Normal map bends shading normals on the second rectangle.
    import jax.numpy as jnp

    from sdmm_tpu.render import intersect as isect

    ro = jnp.asarray([[0.0, 0.0, 2.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = isect.intersect(scene, ro, rd)
    it = isect.surface_interaction(scene, ro, rd, hit)
    # Force the normal-mapped bsdf row.
    nm_idx = next(i for i, d in enumerate(b.bsdfs) if d.get("bump", -1) <= -2)
    it["bsdf"] = jnp.asarray([nm_idx])
    ns = isect.apply_bumpmap(scene, it)
    assert abs(float(ns[0, 0])) > 0.2  # tilted toward +u
    assert np.isclose(float(jnp.linalg.norm(ns[0])), 1.0, atol=1e-5)


def _coat_params(n, eta=1.5, thickness=1.0, sigma_a=(0.0, 0.0, 0.0),
                 child_albedo=(0.6, 0.5, 0.4)):
    import jax.numpy as jnp

    from sdmm_tpu.scene.scene import BSDF_DIFFUSE

    return {
        "type": jnp.full((n,), BSDF_DIFFUSE, jnp.int32),
        "albedo": jnp.tile(jnp.asarray(child_albedo), (n, 1)),
        "specular": jnp.ones((n, 3)),
        "alpha": jnp.full((n,), 0.1),
        "eta": jnp.full((n,), 1.5),
        "k": jnp.ones((n, 3)),
        "exponent": jnp.full((n,), 30.0),
        "alpha_v": jnp.full((n,), 0.1),
        "is_coat": jnp.ones((n,), bool),
        "coat_eta": jnp.full((n,), eta),
        "coat_sa": jnp.tile(jnp.asarray(sigma_a), (n, 1)) * thickness,
        "coat_spec": jnp.ones((n, 3)),
    }


def test_coating_eta1_reduces_to_child():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod

    n = 2048
    key = jax.random.PRNGKey(2)
    from sdmm_tpu.core import warp

    wo = warp.square_to_cosine_hemisphere(jax.random.uniform(key, (n, 2)))
    wi = jnp.broadcast_to(jnp.asarray([0.3, 0.1, np.sqrt(1 - 0.1)]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    p = _coat_params(n, eta=1.0 + 1e-7)
    f_c, pdf_c = bsdf_mod.eval_pdf_full(p, wi, wo)
    core = {k: v for k, v in p.items() if not k.startswith(("is_coat", "coat"))}
    f_d, pdf_d = bsdf_mod.eval_pdf(core, wi, wo)
    assert np.allclose(np.asarray(f_c), np.asarray(f_d), atol=2e-3)
    # prob_spec ~ 0 at eta=1 (R12=0), so the nested pdf carries full weight.
    assert np.allclose(np.asarray(pdf_c), np.asarray(pdf_d), atol=2e-3)


def test_coating_sample_pdf_consistency():
    """Smooth (non-delta) coated samples must chi-square match eval_pdf_full."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.utils.chisquare import chi2_test

    n = 200_000
    wi = np.asarray([0.5, 0.1, np.sqrt(1 - 0.26)])
    wi = wi / np.linalg.norm(wi)
    p = _coat_params(n, eta=1.5, sigma_a=(0.1, 0.2, 0.3))
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    wi_b = jnp.tile(jnp.asarray(wi, jnp.float32), (n, 1))
    bs = bsdf_mod.sample_full(
        p, wi_b,
        jax.random.uniform(k0, (n,)), jax.random.uniform(k1, (n,)),
        jax.random.uniform(k2, (n, 2)),
    )
    acc = (np.asarray(jnp.max(bs["weight"], -1)) > 0) & ~np.asarray(bs["delta"])
    dirs = np.asarray(bs["wo"])[acc]

    p1 = _coat_params(1, eta=1.5, sigma_a=(0.1, 0.2, 0.3))

    def pdf_fn(d):
        d = jnp.asarray(d, jnp.float32)
        m = d.shape[0]
        pp = {k: jnp.broadcast_to(v, (m,) + v.shape[1:]) for k, v in p1.items()}
        wi_m = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (m, 3))
        _, pdf = bsdf_mod.eval_pdf_full(pp, wi_m, d)
        return np.asarray(pdf)

    passed, p_value, st = chi2_test(dirs, pdf_fn)
    assert passed, (p_value, st)


def test_coating_energy_and_render():
    """Coated white diffuse conserves energy; absorption darkens it."""
    import numpy as np

    from sdmm_tpu.scene.xml_loader import load_scene

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        xml = """<scene version="0.6.0">
          <integrator type="path"/>
          <sensor type="perspective">
            <film type="hdrfilm">
              <integer name="width" value="8"/><integer name="height" value="8"/>
            </film>
          </sensor>
          <shape type="rectangle">
            <bsdf type="coating">
              <float name="thickness" value="2.0"/>
              <spectrum name="sigmaA" value="0.2 0.4 0.6"/>
              <bsdf type="diffuse"/>
            </bsdf>
          </shape>
          <shape type="sphere">
            <bsdf type="roughcoating">
              <bsdf type="roughconductor"/>
            </bsdf>
          </shape>
        </scene>"""
        fn = os.path.join(td, "s.xml")
        open(fn, "w").write(xml)
        b = load_scene(fn)
        scene, cfg = b.build()
        from sdmm_tpu.scene.scene import BSDF_COATING

        assert sum(1 for d in b.bsdfs if d["type"] == BSDF_COATING) == 2
        assert BSDF_COATING in cfg.bsdf_types


def test_roughcoating_sample_pdf_consistency():
    """Rough layer boundary (reference: bsdfs/roughcoating.cpp): the GGX
    specular lobe joins the solid-angle measure, so ALL samples (none are
    delta) must chi-square match eval_pdf_full."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.utils.chisquare import chi2_test

    n = 200_000
    wi = np.asarray([0.4, -0.2, np.sqrt(1 - 0.2)])
    wi = wi / np.linalg.norm(wi)
    p = _coat_params(n, eta=1.5, sigma_a=(0.05, 0.05, 0.05))
    p["coat_alpha"] = jnp.full((n,), 0.3)
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(4), 3)
    wi_b = jnp.tile(jnp.asarray(wi, jnp.float32), (n, 1))
    bs = bsdf_mod.sample_full(
        p, wi_b,
        jax.random.uniform(k0, (n,)), jax.random.uniform(k1, (n,)),
        jax.random.uniform(k2, (n, 2)),
    )
    delta = np.asarray(bs["delta"])
    assert not delta.any(), "rough coating has no delta lobes"
    acc = np.asarray(jnp.max(bs["weight"], -1)) > 0
    dirs = np.asarray(bs["wo"])[acc]

    p1 = _coat_params(1, eta=1.5, sigma_a=(0.05, 0.05, 0.05))
    p1["coat_alpha"] = jnp.full((1,), 0.3)

    def pdf_fn(d):
        d = jnp.asarray(d, jnp.float32)
        m = d.shape[0]
        pb = {k: (jnp.broadcast_to(v, (m,) + v.shape[1:])
                  if hasattr(v, "shape") else v) for k, v in p1.items()}
        wim = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (m, 3))
        _, pdf = bsdf_mod.eval_pdf_full(pb, wim, d)
        return np.asarray(pdf)

    passed, pv, st = chi2_test(dirs, pdf_fn)
    assert passed, (pv, st)


def test_roughcoating_specular_lobe_near_mirror():
    """High-gloss rough coating concentrates samples near the mirror
    direction; smooth coating makes them exactly delta."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod

    n = 50_000
    wi = np.asarray([0.5, 0.0, np.sqrt(0.75)])
    p = _coat_params(n, eta=1.5)
    p["coat_alpha"] = jnp.full((n,), 0.05)
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    wi_b = jnp.tile(jnp.asarray(wi, jnp.float32), (n, 1))
    bs = bsdf_mod.sample_full(
        p, wi_b, jax.random.uniform(k0, (n,)),
        jax.random.uniform(k1, (n,)), jax.random.uniform(k2, (n, 2)),
    )
    wo = np.asarray(bs["wo"])
    mirror = np.asarray([-wi[0], -wi[1], wi[2]])
    close = (wo @ mirror) > 0.99
    # The specular branch (~Fresnel-weighted) lands tight around mirror.
    assert close.mean() > 0.02


def test_thindielectric_sample_semantics():
    """Thin slab (reference: bsdfs/thindielectric.cpp): reflect fraction
    matches R' = R + T^2 R/(1-R^2); transmission is straight through."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.bsdf.fresnel import fresnel_dielectric
    from sdmm_tpu.scene.scene import BSDF_THINDIELECTRIC

    n = 200_000
    eta = 1.5
    wi = np.array([0.3, -0.2, 0.0])
    wi[2] = np.sqrt(1 - wi[0] ** 2 - wi[1] ** 2)
    params = {
        "type": jnp.full((n,), BSDF_THINDIELECTRIC, dtype=jnp.int32),
        "albedo": jnp.ones((n, 3)),
        "specular": jnp.ones((n, 3)),
        "alpha": jnp.full((n,), 0.1),
        "eta": jnp.full((n,), eta),
        "k": jnp.zeros((n, 3)),
        "exponent": jnp.full((n,), 30.0),
        "alpha_v": jnp.full((n,), 0.1),
    }
    wi_b = jnp.tile(jnp.asarray(wi), (n, 1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n, 2))
    bs = bsdf_mod.sample(params, wi_b, u1, u2)
    wo = np.asarray(bs["wo"])
    assert bool(np.asarray(bs["delta"]).all())

    refl = wo[:, 2] > 0
    fr0 = float(np.asarray(
        fresnel_dielectric(jnp.asarray([wi[2]]), jnp.asarray([eta]))[0]
    )[0])
    fr_thin = fr0 + (1 - fr0) ** 2 * fr0 / (1 - fr0 * fr0)
    assert abs(refl.mean() - fr_thin) < 0.01, (refl.mean(), fr_thin)
    # Reflection mirrors, transmission passes straight through.
    assert np.allclose(wo[refl], wi * np.array([-1, -1, 1]), atol=1e-6)
    assert np.allclose(wo[~refl], -wi, atol=1e-6)
    # Delta weights are unit (energy conservation: R'+T' = 1 by selection).
    w = np.asarray(bs["weight"])
    assert np.allclose(w, 1.0, atol=1e-6)
    # Straight-through lanes are flagged pass (skip sidedness cull).
    assert bool(np.asarray(bs["pass"])[~refl].all())
    assert not bool(np.asarray(bs["pass"])[refl].any())


def test_thindielectric_eta1_transmits_everything():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdmm_tpu import bsdf as bsdf_mod
    from sdmm_tpu.scene.scene import BSDF_THINDIELECTRIC

    n = 10_000
    params = {
        "type": jnp.full((n,), BSDF_THINDIELECTRIC, dtype=jnp.int32),
        "albedo": jnp.ones((n, 3)),
        "specular": jnp.ones((n, 3)),
        "alpha": jnp.full((n,), 0.1),
        "eta": jnp.ones((n,)),
        "k": jnp.zeros((n, 3)),
        "exponent": jnp.full((n,), 30.0),
        "alpha_v": jnp.full((n,), 0.1),
    }
    wi = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    u1 = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    bs = bsdf_mod.sample(params, wi, u1, u2)
    assert bool((np.asarray(bs["wo"])[:, 2] < 0).all())
