"""Learned-BSDF mixtures + product sampling (reference S6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu.core import warp
from sdmm_tpu.guiding import mixture as mix
from sdmm_tpu.guiding.learned_bsdf import (
    build_learned_table,
    cosine_dmm,
    fit_directional_mixture,
    to_world_conditional,
)
from sdmm_tpu.guiding import em as em_mod
from sdmm_tpu.guiding.trainer import SDMMTrainer, TrainerConfig

from test_render import make_box_scene
from test_mixture import fibonacci_sphere


def test_cosine_dmm_matches_cosine_lobe():
    w, mu, cov = cosine_dmm(4)
    assert abs(w.sum() - 1.0) < 1e-4
    # Build a Conditional at identity orientation and compare to cos/pi.
    rot = np.asarray(jax.vmap(lambda m: jnp.eye(3))(jnp.zeros((4,))))
    from sdmm_tpu.guiding import tangent as tg

    c = mix.Conditional(
        weight=jnp.asarray(w),
        mu_dir=jnp.asarray(mu),
        rot=tg.make_rotation(jnp.asarray(mu)),
        chol=jnp.linalg.cholesky(jnp.asarray(cov)),
        inv_chol=jnp.linalg.inv(jnp.linalg.cholesky(jnp.asarray(cov))),
        inv_det=1.0 / jnp.sqrt(jnp.linalg.det(jnp.asarray(cov))),
        valid=jnp.asarray(True),
    )
    dirs = jnp.asarray(fibonacci_sphere(20000), jnp.float32)
    pdf = np.asarray(mix.conditional_pdf(c, dirs))
    target = np.maximum(np.asarray(dirs)[:, 2], 0.0) / np.pi
    # Integrates to ~1 and correlates strongly with the cosine lobe.
    integral = pdf.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.03
    corr = np.corrcoef(pdf, target)[0, 1]
    assert corr > 0.95, corr


def test_fit_recovers_vmf_like_lobe():
    key = jax.random.PRNGKey(0)
    # Narrow lobe around +x.
    u = jax.random.normal(key, (8000, 3)) * 0.15 + jnp.array([1.0, 0.0, 0.0])
    d = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w, mu, cov = fit_directional_mixture(d, jnp.ones(8000), n_components=2, iters=20)
    dom = np.argmax(w)
    assert np.dot(mu[dom], [1.0, 0.0, 0.0]) > 0.99


def test_learned_table_and_world_rotation():
    b = make_box_scene(8, 8)
    scene, cfg = b.build()
    table = build_learned_table(scene)
    assert bool(table["has"][0])  # diffuse walls have a DMM
    n = 16
    bsdf_idx = jnp.zeros(n, jnp.int32)
    n_ax = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))  # +y normal
    s_ax = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (n, 1))
    t_ax = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    wi_local = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    c, has = to_world_conditional(table, bsdf_idx, s_ax, t_ax, n_ax, wi_local)
    assert bool(has.all())
    # Cosine DMM rotated to a +y normal: pdf(+y) >> pdf(-y).
    c0 = jax.tree.map(lambda x: x[0], c)
    up = float(mix.conditional_pdf(c0, jnp.asarray([0.0, 1.0, 0.0])))
    down = float(mix.conditional_pdf(c0, jnp.asarray([0.0, -1.0, 0.0])))
    assert up > 100 * max(down, 1e-9), (up, down)


def test_product_training_runs_unbiased():
    b = make_box_scene(16, 16)
    scene, cfg = b.build()
    cfg.max_depth = 3
    cfg.rr_depth = 3
    tc = TrainerConfig(
        n_components=8, max_leaves=32, split_threshold=2000,
        samples_per_iteration=2, rays_per_wave=16 * 16,
        em=em_mod.EMConfig(batch_size=1 << 11), sample_product=True,
    )
    trainer = SDMMTrainer(scene, cfg, tc)
    combined, iters = trainer.run(total_spp=16)
    assert np.isfinite(combined).all()
    from sdmm_tpu.render.renderer import render

    ref = render(scene, cfg, spp=128, seed=9, rays_per_wave=16 * 16, nee=True)
    rel = abs(combined.mean() - np.asarray(ref["image"]).mean()) / np.asarray(
        ref["image"]
    ).mean()
    assert rel < 0.2, rel


def test_roughconductor_conditioned_dmm():
    """Theta-binned GGX DMM peaks near the reflection direction."""
    import jax.numpy as _jnp
    from sdmm_tpu.scene.scene import SceneBuilder as SB, BSDF_ROUGHCONDUCTOR as RC

    b = SB()
    rc = b.add_bsdf(RC, alpha=0.15, specular=[1, 1, 1], eta=0.2,
                    k=[3.9, 2.45, 2.14])
    from sdmm_tpu.scene import shapes as _shp
    import numpy as _np

    b.add_shape(_shp.make_rectangle(_np.eye(4)), rc)
    scene, cfg = b.build()
    table = build_learned_table(scene)
    assert bool(table["has"][rc])
    assert int(table["mode"][rc]) == 2

    # wi at 45° with azimuth 30°; identity shading frame.
    th = _np.deg2rad(45.0)
    ph = _np.deg2rad(30.0)
    wi = _jnp.asarray(
        [[_np.sin(th) * _np.cos(ph), _np.sin(th) * _np.sin(ph), _np.cos(th)]],
        _jnp.float32,
    )
    n = 1
    s_ax = _jnp.tile(_jnp.asarray([1.0, 0, 0]), (n, 1))
    t_ax = _jnp.tile(_jnp.asarray([0.0, 1, 0]), (n, 1))
    n_ax = _jnp.tile(_jnp.asarray([0.0, 0, 1]), (n, 1))
    cond, has = to_world_conditional(
        table, _jnp.full((n,), rc, _jnp.int32), s_ax, t_ax, n_ax, wi
    )
    assert bool(has[0])
    c0 = jax.tree.map(lambda x: x[0], cond)
    refl = _jnp.asarray([-wi[0, 0], -wi[0, 1], wi[0, 2]])
    p_refl = float(mix.conditional_pdf(c0, refl))
    p_opp = float(mix.conditional_pdf(c0, -refl))
    p_side = float(mix.conditional_pdf(
        c0, _jnp.asarray([wi[0, 1], -wi[0, 0], wi[0, 2]])
    ))
    assert p_refl > 20 * max(p_opp, 1e-9), (p_refl, p_opp)
    assert p_refl > 3 * p_side, (p_refl, p_side)


def test_generic_hooks_cover_roughplastic_and_blend():
    """roughplastic / roughdielectric / blend get self-fit theta-binned
    mixtures (reference getDMM hooks in roughplastic.cpp:212,
    roughdielectric.cpp:198, blendbsdf.cpp:87); the fitted lobe must put
    most of its sampled mass in the reflection hemisphere for grazing
    roughplastic, and integrate to 1."""
    from sdmm_tpu.scene.scene import (
        BSDF_BLEND,
        BSDF_DIFFUSE,
        BSDF_ROUGHPLASTIC,
    )

    b = make_box_scene(8, 8)
    rp = b.add_bsdf(BSDF_ROUGHPLASTIC, alpha=0.2, eta=1.5,
                    albedo=[0.4, 0.2, 0.1])
    d2 = b.add_bsdf(BSDF_DIFFUSE, albedo=[0.2, 0.6, 0.2])
    bl = b.add_bsdf(BSDF_BLEND, child0=rp, child1=d2, weight=0.4)
    import sdmm_tpu.scene.shapes as shp

    m = np.eye(4)
    m[:3, 3] = [0.0, 0.5, 0.0]
    b.add_shape(shp.make_rectangle(m, False), bl)
    scene, cfg = b.build()

    table = build_learned_table(scene)
    has = np.asarray(table["has"])
    assert has[rp] and has[bl]
    assert int(np.asarray(table["mode"])[rp]) == 2
    # Mixture weights are normalized per bin.
    w = np.asarray(table["weight"][rp])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)
    # Grazing bin: mean directions stay in the upper hemisphere and lean
    # away from the incidence azimuth (specular reflection of +x-ish wi
    # points toward -x).
    mu = np.asarray(table["mu_local"][rp][-1])
    assert (mu[:, 2] > -0.2).all()


def test_product_uses_pruned_conditional():
    """mix.prune_conditional feeds the product path: a pruned learned
    conditional keeps the product component count at K_guide x top_k."""
    from sdmm_tpu.guiding.learned_bsdf import PRODUCT_TOP_K

    scene, cfg = make_box_scene(8, 8).build()
    table = build_learned_table(scene)
    n = 4
    s_ax = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (n, 1))
    t_ax = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (n, 1))
    n_ax = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    wi = jnp.tile(jnp.array([0.3, 0.1, 0.95]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    cond_b, has = to_world_conditional(
        table, jnp.zeros((n,), jnp.int32), s_ax, t_ax, n_ax, wi
    )
    pruned = mix.prune_conditional(cond_b, PRODUCT_TOP_K)
    assert pruned.weight.shape == (n, PRODUCT_TOP_K)
    prod = mix.product(pruned, pruned)
    assert prod.weight.shape[-1] == PRODUCT_TOP_K * PRODUCT_TOP_K
