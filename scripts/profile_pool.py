"""Profile one render_pool run on the TPU; summarize op costs from the XPlane.

Usage: python scripts/profile_pool.py [trace_dir]
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")
from sdmm_tpu.utils.cache import enable as enable_cache  # noqa: E402

enable_cache()
import jax  # noqa: E402

from sdmm_tpu.render.wavefront import render_pool  # noqa: E402
from sdmm_tpu.scene.xml_loader import load_scene  # noqa: E402

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pooltrace"

scene, cfg = load_scene(
    "/root/reference/test-suite/scenes/cornell-box/cornell-box.xml",
    overrides={"integrator": "gt"},
).build()
cfg.max_depth = 10
cfg.rr_depth = 10


def run(seed):
    return render_pool(
        scene, jax.random.PRNGKey(seed), n_lanes=1 << 17, spp=4,
        width=cfg.width, height=cfg.height, max_depth=10, rr_depth=10,
        nee=True, bsdf_types=cfg.bsdf_types or None, fov_axis=cfg.fov_axis,
    )


out = run(0)
jax.block_until_ready(out["image"])
os.makedirs(TRACE_DIR, exist_ok=True)
with jax.profiler.trace(TRACE_DIR):
    out = run(1)
    jax.block_until_ready(out["image"])
print("steps:", int(out["steps"]))

# ---- Summarize device-side op durations from the raw XPlane proto ----
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    totals = defaultdict(float)
    counts = defaultdict(int)
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" not in line.name:
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            totals[name] += ev.duration_ps / 1e9  # ms
            counts[name] += 1
    if not totals:
        continue
    grand = sum(totals.values())
    print(f"\n== {plane.name}: {grand:.1f} ms device time ==")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.2f} ms {100*ms/grand:5.1f}% x{counts[name]:<5d} {name[:90]}")
