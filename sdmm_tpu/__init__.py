"""sdmm_tpu — TPU-native differentiable path tracer with SDMM path guiding.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
anadodik/sdmm-mitsuba (Mitsuba 0.6 + spatio-directional mixture-model path
guiding), redesigned TPU-first:

- wavefront path tracing over ray batches (``lax.scan`` over bounce depth)
  instead of per-tile worker threads
  (reference: mitsuba/src/integrators/sdmm/sdmm_proc.cpp:592 ``Li``),
- ``[leaves, components]`` SoA tangent-space Gaussian mixtures with
  segment-sum sufficient statistics instead of mutex-guarded sample buffers
  (reference: jmm/opt/stepwise_tangent.h:597 ``optimize``),
- pjit/shard_map collectives over ICI/DCN instead of the socket/SSH render
  farm (reference: mitsuba/src/libcore/sched_remote.cpp),
- end-to-end differentiability (pixel gradients w.r.t. scene and mixture
  parameters), which the reference does not have.
"""

__version__ = "0.1.0"
