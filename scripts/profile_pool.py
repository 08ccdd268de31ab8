"""Profile one render_pool run on the TPU; summarize op costs from the XPlane."""
import sys, time, glob, os
sys.path.insert(0, ".")
from sdmm_tpu.utils.cache import enable as enable_cache
enable_cache()
import jax
from sdmm_tpu.render.wavefront import render_pool
from sdmm_tpu.scene.xml_loader import load_scene

scene, cfg = load_scene(
    "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
    overrides={"integrator": "gt"},
).build()
cfg.max_depth = 10; cfg.rr_depth = 10

def run(seed):
    return render_pool(scene, jax.random.PRNGKey(seed), n_lanes=1 << 17, spp=12,
                       width=cfg.width, height=cfg.height, max_depth=10,
                       rr_depth=10, nee=True, bsdf_types=cfg.bsdf_types or None,
                       fov_axis=cfg.fov_axis)

out = run(0); jax.block_until_ready(out["image"])
os.makedirs("/tmp/pooltrace", exist_ok=True)
with jax.profiler.trace("/tmp/pooltrace"):
    out = run(1); jax.block_until_ready(out["image"])
print("steps:", int(out["steps"]))

# Summarize
from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa
