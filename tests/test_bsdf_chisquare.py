"""Chi-square sample↔pdf consistency for every smooth BSDF model.

Replicates the reference's canonical BSDF test
(reference: mitsuba/src/tests/test_chisquare.cpp:391 — chi-square over all
BSDFs at randomized angles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdmm_tpu import bsdf as bsdf_mod
from sdmm_tpu.core.frame import normalize
from sdmm_tpu.scene.scene import (
    BSDF_DIFFTRANS,
    BSDF_DIFFUSE,
    BSDF_HK,
    BSDF_PHONG,
    BSDF_PLASTIC,
    BSDF_ROUGHCONDUCTOR,
    BSDF_ROUGHDIELECTRIC,
    BSDF_ROUGHDIFFUSE,
    BSDF_ROUGHPLASTIC,
    BSDF_WARD,
)
from sdmm_tpu.utils.chisquare import chi2_test


def make_params(btype, n, **over):
    base = {
        "type": jnp.full((n,), btype, dtype=jnp.int32),
        "albedo": jnp.tile(jnp.asarray(over.get("albedo", [0.5, 0.4, 0.3])), (n, 1)),
        "specular": jnp.tile(jnp.asarray(over.get("specular", [1.0, 1.0, 1.0])), (n, 1)),
        "alpha": jnp.full((n,), over.get("alpha", 0.3)),
        "eta": jnp.full((n,), over.get("eta", 1.5)),
        "k": jnp.tile(jnp.asarray(over.get("k", [3.9, 2.45, 2.14])), (n, 1)),
        "exponent": jnp.full((n,), over.get("exponent", 30.0)),
        "alpha_v": jnp.full((n,), over.get("alpha_v", over.get("alpha", 0.3))),
    }
    return base


def run_chi2(btype, wi, n=200_000, seed=0, **over):
    params = make_params(btype, n, **over)
    wi_b = jnp.tile(jnp.asarray(wi), (n, 1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n, 2))
    bs = bsdf_mod.sample(params, wi_b, u1, u2)
    w = np.asarray(jnp.max(bs["weight"], axis=-1))
    accepted = (w > 0) & ~np.asarray(bs["delta"])
    dirs = np.asarray(bs["wo"])[accepted]

    params1 = make_params(btype, 1, **over)

    def pdf_fn(d):
        d = jnp.asarray(d, dtype=jnp.float32)
        m = d.shape[0]
        p = {k: jnp.broadcast_to(v, (m,) + v.shape[1:]) for k, v in params1.items()}
        wi_m = jnp.broadcast_to(jnp.asarray(wi, dtype=jnp.float32), (m, 3))
        _, pdf = bsdf_mod.eval_pdf(p, wi_m, d)
        return np.asarray(pdf)

    # The sampling pdf integrates to the acceptance rate; scale expectation.
    passed, p_value, st = chi2_test(dirs, pdf_fn)
    return passed, p_value, st, accepted.mean()


WI_ANGLES = [
    [0.0, 0.0, 1.0],
    [0.5, 0.1, np.sqrt(1 - 0.26)],
    [0.8, -0.3, np.sqrt(1 - 0.73)],
]


@pytest.mark.parametrize("btype,over", [
    (BSDF_DIFFUSE, {}),
    (BSDF_ROUGHCONDUCTOR, {"alpha": 0.3}),
    (BSDF_ROUGHCONDUCTOR, {"alpha": 0.08}),
    (BSDF_PHONG, {"exponent": 20.0}),
    (BSDF_ROUGHPLASTIC, {"alpha": 0.25}),
    (BSDF_PLASTIC, {}),
    (BSDF_ROUGHDIELECTRIC, {"alpha": 0.3}),
    (BSDF_WARD, {"alpha": 0.2, "alpha_v": 0.45}),
    (BSDF_WARD, {"alpha": 0.35, "alpha_v": 0.35}),
    (BSDF_ROUGHDIFFUSE, {"alpha": 0.4}),
    (BSDF_DIFFTRANS, {}),
    # hk: eta carries the HG g, alpha the slab thickness,
    # albedo/specular are sigmaS/sigmaA (reference: bsdfs/hk.cpp).
    (BSDF_HK, {"albedo": [2.0, 2.0, 2.0], "specular": [0.1, 0.1, 0.1],
               "alpha": 0.4, "eta": 0.0}),
    (BSDF_HK, {"albedo": [1.5, 1.0, 0.7], "specular": [0.05, 0.1, 0.2],
               "alpha": 0.8, "eta": 0.5}),
])
def test_bsdf_chi2(btype, over):
    wi = np.asarray(WI_ANGLES[1])
    wi = wi / np.linalg.norm(wi)
    passed, p, st, acc = run_chi2(btype, wi, **over)
    assert passed, (btype, p, st, acc)


def test_roughdielectric_from_inside():
    wi = np.array([0.3, 0.2, -0.9])
    wi = wi / np.linalg.norm(wi)
    passed, p, st, acc = run_chi2(BSDF_ROUGHDIELECTRIC, wi, alpha=0.3)
    assert passed, (p, st, acc)


def test_energy_conservation_white_furnace():
    """∫ f·cos dω ≤ 1 for reflectance-1 rough conductor (no absorption)."""
    n = 400_000
    params = make_params(
        BSDF_ROUGHCONDUCTOR, 1, specular=[1.0, 1.0, 1.0], k=[0.0, 0.0, 0.0],
        eta=0.0, alpha=0.4,
    )
    i = np.arange(n) + 0.5
    phi = np.pi * (1 + 5**0.5) * i
    z = 1 - 2 * i / n
    r = np.sqrt(np.maximum(0, 1 - z * z))
    dirs = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1), jnp.float32)
    p = {k: jnp.broadcast_to(v, (n,) + v.shape[1:]) for k, v in params.items()}
    wi = jnp.broadcast_to(jnp.asarray([0.2, 0.1, 0.97]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    f, _ = bsdf_mod.eval_pdf(p, wi, dirs)
    integral = float(jnp.mean(jnp.max(f, axis=-1)) * 4 * np.pi)
    assert integral <= 1.05, integral


def test_hk_energy_and_delta_transmission():
    """HK slab: white-furnace energy bound and the delta lobe's attenuation
    (reference: hk.cpp eval EDiscrete — exp(-tauD/|cos|))."""
    n = 100_000
    over = {"albedo": [1.0, 1.0, 1.0], "specular": [0.0, 0.0, 0.0],
            "alpha": 0.5, "eta": 0.3}
    params = make_params(BSDF_HK, n, **over)
    wi = jnp.asarray([0.3, 0.1, np.sqrt(1 - 0.1)], dtype=jnp.float32)
    wi = wi / jnp.linalg.norm(wi)
    wi_b = jnp.tile(wi, (n, 1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n, 2))
    bs = bsdf_mod.sample(params, wi_b, u1, u2)
    w = np.asarray(bs["weight"])
    delta = np.asarray(bs["delta"])
    # No absorption (sigmaA = 0): total reflect+transmit energy <= 1 and,
    # for a single-scattering approximation, substantially positive.
    mean_w = w.mean(0)[0]
    assert 0.3 < mean_w <= 1.0 + 1e-3, mean_w
    # Delta samples pass straight through.
    wo_d = np.asarray(bs["wo"])[delta]
    np.testing.assert_allclose(wo_d, -np.asarray(wi_b)[delta], atol=1e-6)
    # Delta fraction equals the average unscattered probability.
    tau = 1.0 * 0.5  # sigmaT * thickness
    p_expect = np.exp(-tau / float(wi[2]))
    assert abs(delta.mean() - p_expect) < 0.01, (delta.mean(), p_expect)
