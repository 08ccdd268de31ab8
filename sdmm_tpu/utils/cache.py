"""Persistent XLA compilation cache.

The biggest fixed cost of TPU sessions is (re)compilation — especially via
remote-compile tunnels. Enabling JAX's persistent cache makes repeat CLI /
bench invocations start in seconds. Opt out with SDMM_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("SDMM_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SDMM_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sdmm_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
