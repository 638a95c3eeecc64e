"""Persistent XLA compilation cache setup.

The wavefront engine compiles one executable per (bucketed) shape; caching
them on disk makes repeated CLI invocations and test runs start fast.

The cache is enabled only for TPU backends: jaxlib 0.9.0's CPU backend
aborts (SIGABRT/SIGSEGV in C++) while serializing or deserializing some
large Pallas-interpret executables, which took down two full test runs.
CPU processes (the test suite's virtual mesh) rely on the in-process
cache instead.  Set CPECAN_TPU_CACHE_CPU=1 to force-enable on CPU.
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # Resolve the configured platform WITHOUT initializing the backend
    # (this runs before jax.distributed.initialize in the CLIs).
    try:
        platforms = jax.config.jax_platforms or ""
    except Exception:
        platforms = ""
    platforms = platforms or os.environ.get("JAX_PLATFORMS", "")
    first = platforms.split(",")[0].strip().lower()
    if first == "cpu" and not os.environ.get("CPECAN_TPU_CACHE_CPU"):
        return

    path = path or os.environ.get(
        "CPECAN_TPU_CACHE", os.path.expanduser("~/.cache/cpecan_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax versions without the persistent cache
