"""Persistent XLA compilation cache setup.

The wavefront engine compiles one executable per (bucketed) shape; caching
them on disk makes repeated CLI invocations and test runs start fast.
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "CPECAN_TPU_CACHE", os.path.expanduser("~/.cache/cpecan_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax versions without the persistent cache
