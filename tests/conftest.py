"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware, per the
framework's test strategy (SURVEY.md §4; the reference had no distributed
tests at all).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
