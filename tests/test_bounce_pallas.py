"""Fused bounce megakernel (ops/bounce_pallas) vs the XLA wavefront pool.

Both drivers implement the same estimator (regenerating lane pool, NEE
with power-heuristic MIS, cosine-sampled diffuse, RR as in the reference
integrator sdmm_proc.cpp:858), so with enough samples their images must
agree to Monte-Carlo noise. Runs in Pallas interpret mode on CPU.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")
from test_render import make_box_scene  # noqa: E402

from sdmm_tpu.render import wavefront as wf  # noqa: E402


def _render(scene, cfg, fused, spp, seed=7):
    lanes = 8192
    if fused:
        out = wf.render_pool_fused(
            scene, jax.random.PRNGKey(seed), n_lanes=lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
            fov_axis=cfg.fov_axis, interpret=True,
        )
    else:
        out = wf.render_pool(
            scene, jax.random.PRNGKey(seed), n_lanes=lanes, spp=spp,
            width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
            nee=True, bsdf_types=cfg.bsdf_types or None,
            fov_axis=cfg.fov_axis,
        )
    img = np.asarray(out["image"])
    w = np.asarray(out["weight"])
    return img / np.maximum(w, 1.0)[:, None], out


def test_fused_gate_accepts_box_scene():
    scene, cfg = make_box_scene(32, 32).build()
    assert wf.fused_supported(scene, cfg)


def test_fused_matches_pool_image():
    scene, cfg = make_box_scene(24, 24).build()
    spp = 96
    img_f, out_f = _render(scene, cfg, fused=True, spp=spp)
    img_p, out_p = _render(scene, cfg, fused=False, spp=spp)

    # Every camera sample was consumed and splatted exactly once.
    n_pix = cfg.width * cfg.height
    assert float(np.asarray(out_f["weight"]).sum()) == n_pix * spp
    assert float(np.asarray(out_p["weight"]).sum()) == n_pix * spp

    # Same estimator, different RNG streams: means agree to MC noise.
    m_f = img_f.mean()
    m_p = img_p.mean()
    assert abs(m_f - m_p) / m_p < 0.05, (m_f, m_p)
    # Per-pixel: smoothed difference small relative to image mean.
    diff = np.abs(img_f - img_p).mean()
    assert diff / m_p < 0.35, (diff, m_p)

    # Path-vertex counts agree (same survival distribution).
    nv_f = float(out_f["n_vertices"])
    nv_p = float(out_p["n_vertices"])
    assert abs(nv_f - nv_p) / nv_p < 0.03, (nv_f, nv_p)


def test_fused_image_nontrivial():
    scene, cfg = make_box_scene(16, 16).build()
    img, out = _render(scene, cfg, fused=True, spp=32)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # light visible
    # Red wall tint on the left, green on the right.
    hw = img.reshape(cfg.height, cfg.width, 3)
    left = hw[:, :4].mean(axis=(0, 1))
    right = hw[:, -4:].mean(axis=(0, 1))
    assert left[0] > left[2]
    assert right[1] > right[0]


def _glossy_box_scene(w=24, h=24):
    """Box with conductor, dielectric and roughconductor rectangles on the
    walls — exercises every in-kernel BSDF model."""
    import numpy as np

    import sdmm_tpu.scene.shapes as shp
    from sdmm_tpu.scene.scene import (
        BSDF_CONDUCTOR,
        BSDF_DIELECTRIC,
        BSDF_ROUGHCONDUCTOR,
    )

    b = make_box_scene(w, h)
    mirror = b.add_bsdf(BSDF_CONDUCTOR, eta=0.2, k=[3.9, 2.45, 2.14])
    glass = b.add_bsdf(BSDF_DIELECTRIC, eta=1.5)
    rough = b.add_bsdf(BSDF_ROUGHCONDUCTOR, alpha=0.25, eta=0.2,
                       k=[3.9, 2.45, 2.14])

    def panel(translate, ry, bsdf):
        m = np.eye(4)
        m[:3, :3] = np.diag([0.35, 0.35, 1.0])
        rot = np.eye(4)
        a = np.deg2rad(ry)
        rot[0, 0] = rot[2, 2] = np.cos(a)
        rot[0, 2] = np.sin(a)
        rot[2, 0] = -np.sin(a)
        out = rot @ m
        out[:3, 3] = translate
        b.add_shape(shp.make_rectangle(out, False), bsdf)

    panel([-0.95, 1.0, 0.2], 90, mirror)
    panel([0.95, 0.7, -0.2], -90, rough)
    panel([0.0, 0.6, 0.3], 10, glass)
    return b.build()


def test_fused_multibsdf_matches_pool():
    """Conductor/dielectric/roughconductor lanes through the megakernel
    agree with the XLA pool's estimator."""
    scene, cfg = _glossy_box_scene()
    assert set(cfg.bsdf_types) > {0}
    assert wf.fused_supported(scene, cfg)
    spp = 64

    out_f = wf.render_pool_fused(
        scene, jax.random.PRNGKey(3), n_lanes=8192, spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, bsdf_types=tuple(cfg.bsdf_types),
        interpret=True,
    )
    out_p = wf.render_pool(
        scene, jax.random.PRNGKey(3), n_lanes=8192, spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        nee=True, bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
    )
    img_f = np.asarray(out_f["image"]) / np.maximum(
        np.asarray(out_f["weight"]), 1.0)[:, None]
    img_p = np.asarray(out_p["image"]) / np.maximum(
        np.asarray(out_p["weight"]), 1.0)[:, None]
    m_f, m_p = img_f.mean(), img_p.mean()
    assert abs(m_f - m_p) / m_p < 0.06, (m_f, m_p)
    nv_f = float(out_f["n_vertices"])
    nv_p = float(out_p["n_vertices"])
    assert abs(nv_f - nv_p) / nv_p < 0.04, (nv_f, nv_p)


def _tiled_box_scene(w=24, h=24, n_panels=52):
    """Box plus a grid of small colored tiles on the back wall — pushes the
    triangle count past MAX_UNROLL_TRIS so the kernel takes the chunked
    fori_loop sweep path."""
    import numpy as np

    import sdmm_tpu.scene.shapes as shp

    b = make_box_scene(w, h)
    from sdmm_tpu.scene.scene import BSDF_DIFFUSE

    cols = 8
    for i in range(n_panels):
        r, c = divmod(i, cols)
        bsdf = b.add_bsdf(
            BSDF_DIFFUSE,
            albedo=[0.2 + 0.6 * (i % 3 == 0), 0.2 + 0.6 * (i % 3 == 1),
                    0.2 + 0.6 * (i % 3 == 2)],
        )
        m = np.eye(4)
        m[:3, :3] = np.diag([0.09, 0.09, 1.0])
        m[:3, 3] = [-0.9 + 0.25 * c, 0.15 + 0.25 * r, -0.98]
        b.add_shape(shp.make_rectangle(m, False), bsdf)
    return b.build()


def _one_bounce(scene, n_tris, max_unroll, monkeypatch, seed=11,
                pad_cols=None):
    """One megakernel bounce on fresh random lanes with the unroll limit
    patched, so the same scene can be pushed down either sweep path;
    pad_cols widens the triangle table to force a multi-chunk fori_loop."""
    import jax.numpy as jnp

    from sdmm_tpu.ops import bounce_pallas as bp

    monkeypatch.setattr(bp, "MAX_UNROLL_TRIS", max_unroll)
    tri, em, env = bp.build_tables(scene)
    if pad_cols is not None:
        tri = jnp.pad(tri, ((0, 0), (0, pad_cols - tri.shape[1])))
    r = bp.RT
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    # Random in-box origins and unit directions: exercises hits and misses.
    ro = jax.random.uniform(k1, (3, r, 128), minval=-0.8, maxval=0.8)
    ro = ro.at[1].add(1.0)
    rd = jax.random.normal(k2, (3, r, 128))
    rd = rd / jnp.linalg.norm(rd, axis=0, keepdims=True)
    state = jnp.zeros((16, r, 128))
    state = state.at[0:3].set(ro).at[3:6].set(rd)
    state = state.at[6:9].set(1.0).at[12].set(1.0).at[13].set(1.0)
    meta = jnp.full((r, 128), bp._ALIVE, jnp.int32)
    rand = jax.random.uniform(jax.random.fold_in(key, 3),
                              (bp.RAND_ROWS, r, 128))
    out = bp.bounce(
        state, meta, rand, tri, em, env, n_tris=n_tris,
        n_em=int(scene.em_tri_idx.shape[0]), max_depth=6, rr_depth=6,
        types=(0,), interpret=True,
    )
    return [np.asarray(x) for x in out]


def test_fused_chunked_matches_unrolled(monkeypatch):
    """The chunked fori_loop triangle sweep is bit-identical to the fully
    unrolled sweep on the same scene: both zero-padding within one chunk
    and the multi-chunk partition (2 chunks) leave the result unchanged.

    Uses the 12-triangle box with the unroll limit patched down instead of
    a >96-triangle scene: a 100+-triangle sweep makes XLA's CPU compile of
    the interpret-mode kernel pathologically slow, while the patched route
    compiles in seconds and exercises the identical code. CHUNK is likewise
    patched down from 128 (only needed for TPU lane alignment, which
    interpret mode ignores) to keep the chunk-body unroll small."""
    from sdmm_tpu.ops import bounce_pallas as bp

    scene, cfg = make_box_scene(24, 24).build()
    n_tris = int(scene.tri_v0.shape[0])
    assert n_tris <= bp.MAX_UNROLL_TRIS

    unrolled = _one_bounce(scene, n_tris, max_unroll=96,
                           monkeypatch=monkeypatch)
    monkeypatch.setattr(bp, "CHUNK", 16)
    one_chunk = _one_bounce(scene, n_tris, max_unroll=8,
                            monkeypatch=monkeypatch, pad_cols=16)
    two_chunks = _one_bounce(scene, n_tris, max_unroll=8,
                             monkeypatch=monkeypatch, pad_cols=32)
    for a, b in zip(unrolled, one_chunk):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(unrolled, two_chunks):
        np.testing.assert_array_equal(a, b)
    # The bounce did real work: some lanes hit surfaces.
    assert unrolled[2][7].sum() > 0


def test_fused_gate_admits_chunked_scene():
    """Scenes past the unroll limit (chunked sweep) pass the host gate and
    pad their triangle table to whole chunks."""
    from sdmm_tpu.ops import bounce_pallas as bp

    scene, cfg = _tiled_box_scene()
    assert int(scene.tri_v0.shape[0]) > bp.MAX_UNROLL_TRIS
    assert wf.fused_supported(scene, cfg)
    tri, _, _ = bp.build_tables(scene)
    assert tri.shape[1] % bp.CHUNK == 0


def test_fused_blocked_matches_pool():
    """2D-blocked striped pool with whole-tile skip must agree with the
    global-counter pool in mean and land exactly spp samples per pixel
    (including partial edge blocks)."""
    scene, cfg = make_box_scene(20, 18).build()
    spp = 64
    out = wf.render_pool_fused_blocked(
        scene, jax.random.PRNGKey(3), spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, interpret=True,
    )
    w = np.asarray(out["weight"])
    assert (w == spp).all()
    img_s = np.asarray(out["image"]) / spp

    img_p, _ = _render(scene, cfg, fused=False, spp=spp)
    m_s, m_p = img_s.mean(), img_p.mean()
    assert abs(m_s - m_p) / m_p < 0.06, (m_s, m_p)


def test_fused_sorted_matches_pool():
    """Pilot + cost-sorted main pass must land exactly spp samples per
    pixel and agree with the global-counter pool in mean."""
    scene, cfg = make_box_scene(20, 18).build()
    spp = 64
    out = wf.render_pool_fused_sorted(
        scene, jax.random.PRNGKey(3), spp=spp, spp_pilot=16,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, interpret=True,
    )
    w = np.asarray(out["weight"])
    assert (w == spp).all()
    img_s = np.asarray(out["image"]) / spp

    img_p, _ = _render(scene, cfg, fused=False, spp=spp)
    m_s, m_p = img_s.mean(), img_p.mean()
    assert abs(m_s - m_p) / m_p < 0.06, (m_s, m_p)


def test_fused_sorted2_matches_pool():
    """The fully-fused step kernel (in-kernel regen + camera rays + film,
    host rand under interpret) must land exactly spp samples per pixel
    and agree with the global-counter pool in mean."""
    scene, cfg = make_box_scene(20, 18).build()
    spp = 64
    out = wf.render_pool_fused_sorted2(
        scene, jax.random.PRNGKey(3), spp=spp, spp_pilot=16,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, interpret=True,
    )
    w = np.asarray(out["weight"])
    assert (w == spp).all()
    img_s = np.asarray(out["image"]) / spp

    img_p, _ = _render(scene, cfg, fused=False, spp=spp)
    m_s, m_p = img_s.mean(), img_p.mean()
    assert abs(m_s - m_p) / m_p < 0.06, (m_s, m_p)


def test_fused_shuffled_matches_pool():
    """Shuffled multi-slot fused pool (dense slot-onehot film adds) must
    agree with the global-counter pool in mean and land exactly spp
    samples on every pixel, including when n_lanes*groups > n_pix."""
    scene, cfg = make_box_scene(16, 16).build()
    spp = 64
    out = wf.render_pool_fused_shuffled(
        scene, jax.random.PRNGKey(3), spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, groups=4, interpret=True,
    )
    w = np.asarray(out["weight"])
    assert (w == spp).all()
    img_s = np.asarray(out["image"]) / spp

    img_p, _ = _render(scene, cfg, fused=False, spp=spp)
    m_s, m_p = img_s.mean(), img_p.mean()
    assert abs(m_s - m_p) / m_p < 0.06, (m_s, m_p)


def test_fused_striped_matches_pool():
    """Pixel-stationary fused pool (dense film adds, no scatter) must
    agree with the global-counter pool in mean and land exactly spp
    samples on every pixel."""
    scene, cfg = make_box_scene(16, 16).build()
    spp = 64
    out = wf.render_pool_fused_striped(
        scene, jax.random.PRNGKey(3), spp=spp,
        width=cfg.width, height=cfg.height, max_depth=6, rr_depth=6,
        fov_axis=cfg.fov_axis, interpret=True,
    )
    w = np.asarray(out["weight"])
    assert (w == spp).all()
    img_s = np.asarray(out["image"]) / spp

    img_p, _ = _render(scene, cfg, fused=False, spp=spp)
    m_s, m_p = img_s.mean(), img_p.mean()
    assert abs(m_s - m_p) / m_p < 0.06, (m_s, m_p)
