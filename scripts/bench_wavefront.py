"""Compare classic wave driver vs regenerating wavefront pool on the bench scene."""
import sys, time
sys.path.insert(0, ".")
from sdmm_tpu.utils.cache import enable as enable_cache
enable_cache()
import jax
import jax.numpy as jnp
import numpy as np
from sdmm_tpu.render.volpath import trace_wave
from sdmm_tpu.render.wavefront import render_pool
from sdmm_tpu.scene.sensor import generate_rays
from sdmm_tpu.scene.xml_loader import load_scene

scene, cfg = load_scene(
    "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
    overrides={"integrator": "gt", "samplesPerIteration": 4},
).build()
cfg.max_depth = 10
cfg.rr_depth = 10
w, h = cfg.width, cfg.height

# --- classic ---
n_rays = 1 << 18
pix = jnp.arange(n_rays, dtype=jnp.int32) % (w * h)
px = (pix % w).astype(jnp.float32) + 0.5
py = (pix // w).astype(jnp.float32) + 0.5
ro, rd = generate_rays(scene, jnp.stack([px, py], axis=-1), w, h, cfg.fov_axis)

def run_classic(key):
    return trace_wave(scene, key, ro, rd, max_depth=cfg.max_depth,
                      rr_depth=cfg.rr_depth, nee=True, count_vertices=True,
                      bsdf_types=cfg.bsdf_types or None)

li, nv = run_classic(jax.random.PRNGKey(0)); nv.block_until_ready()
t0 = time.time(); tot = 0
for i in range(8):
    li, nv = run_classic(jax.random.PRNGKey(i))
    tot += int(nv)
li.block_until_ready()
dt = time.time() - t0
print(f"classic:   {tot/dt/1e6:.2f} Mrays/s  ({tot} verts, {dt:.2f}s)")

# --- wavefront pool ---
spp = 12  # ~ same total sample count as 8 classic waves of 256k
for lanes_log in (17, 18, 19):
    lanes = 1 << lanes_log
    out = render_pool(scene, jax.random.PRNGKey(0), n_lanes=lanes, spp=spp,
                      width=w, height=h, max_depth=cfg.max_depth,
                      rr_depth=cfg.rr_depth, nee=True,
                      bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis)
    out["image"].block_until_ready()
    t0 = time.time()
    out = render_pool(scene, jax.random.PRNGKey(1), n_lanes=lanes, spp=spp,
                      width=w, height=h, max_depth=cfg.max_depth,
                      rr_depth=cfg.rr_depth, nee=True,
                      bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis)
    out["image"].block_until_ready()
    dt = time.time() - t0
    nv = float(out["n_vertices"]); steps = int(out["steps"])
    occ = nv / (steps * lanes)
    print(f"wavefront {lanes>>10}k lanes: {nv/dt/1e6:.2f} Mrays/s  "
          f"({nv:.0f} verts, {steps} steps, occ {occ:.2f}, {dt:.2f}s)")
