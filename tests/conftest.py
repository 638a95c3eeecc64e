"""Test config: run JAX on a virtual 8-device CPU mesh.

Sharding/collective code paths are identical on the virtual CPU mesh and a
real TPU slice; bench.py exercises the real chip.

Note: the environment may pre-import jax (sitecustomize) with a TPU
platform selected, so the platform must be overridden via jax.config, not
env vars alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from cpecan_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
