"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware, per the
framework's test strategy (SURVEY.md §4; the reference had no distributed
tests at all). The environment pins JAX_PLATFORMS=axon via sitecustomize, so
we must force-override — tests always run on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
