"""Device-mesh helpers.

The framework scales data-parallel over a 1-D `data` mesh axis: read-pair
batches sharded across chips, the HMM replicated, expectation count
tensors reduced with XLA collectives over ICI (within a slice) and DCN
(across slices). Multi-host launch uses jax.distributed; the same code
path runs on a virtual CPU mesh (xla_force_host_platform_device_count)
for testing — no mocks.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> None:
    """Multi-host init (no-op for single-process runs). The reference's
    jobTree cluster scatter (cPecanEm.py:423) maps to multi-controller JAX:
    every host runs the same program on its shard of the corpus."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
