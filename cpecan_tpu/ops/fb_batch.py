"""Batched / sharded forward-backward execution with engine dispatch.

Two engines serve `fb_pass_batch`:

 * the lax.scan engine (ops/fb.py) vmapped over the batch — runs on any
   backend, supports every mode (it is the only expectation-mode engine
   for now), and doubles as the numerical oracle;
 * the fused Pallas wavefront kernels (ops/fb_wavefront.py) — the fast
   path on TPU for forward/posterior modes.

Selection: env CPECAN_TPU_ENGINE in {"auto" (default), "scan",
"wavefront"}. "auto" picks the wavefront kernels on a TPU backend when
the mode supports them, the scan engine otherwise (including whenever the
call is being traced inside an outer jit, e.g. the sharded EM train
step — the scan engine is fully traceable).

For EM, per-pair expectation tensors are summed over the batch inside
the jit — when the batch axis carries a NamedSharding over a device
mesh, XLA lowers that sum to an AllReduce over ICI: the TPU-native
replacement for the reference's file-gather reduction
(cPecanEm.py:184-188).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from cpecan_tpu.ops import fb


@functools.partial(jax.jit, static_argnames=("mode", "width"))
def fb_pass_batch_scan(params, sx, sy, offsets, widths, lx, ly,
                       ragged_left, ragged_right, mode: str = "expectation",
                       width: int = 0):
    """Batch-of-pairs FB on the scan engine. All array args carry a leading
    batch axis; params are broadcast. In expectation mode the returned
    trans/emis are summed over the batch."""
    out = jax.vmap(
        lambda a, b, c, d, e, f, g, h: fb.fb_pass(
            params, a, b, c, d, e, f, g, h, mode=mode, width=width)
    )(sx, sy, offsets, widths, lx, ly, ragged_left, ragged_right)
    if mode == "expectation":
        out["trans"] = jnp.sum(out["trans"], axis=0)
        out["emis"] = jnp.sum(out["emis"], axis=0)
    return out


def _use_wavefront(params, sx, mode: str) -> bool:
    from cpecan_tpu.ops import fb_wavefront

    engine = os.environ.get("CPECAN_TPU_ENGINE", "auto")
    if engine == "scan" or not fb_wavefront.supported(mode):
        return False
    if isinstance(params["t"], jax.core.Tracer):
        return False  # inside an outer trace; only the scan engine traces
    sharding = getattr(sx, "sharding", None)
    if sharding is not None and len(sharding.device_set) > 1:
        return False  # multi-device batches run the sharded scan engine
    if engine == "wavefront":
        return True
    return jax.default_backend() == "tpu"


def fb_pass_batch(params, sx, sy, offsets, widths, lx, ly,
                  ragged_left, ragged_right, mode: str = "expectation",
                  width: int = 0):
    """Batch-of-pairs FB with automatic engine selection (see module doc)."""
    if _use_wavefront(params, sx, mode):
        from cpecan_tpu.ops import fb_wavefront

        return fb_wavefront.fb_pass_batch_wavefront(
            params, sx, sy, offsets, widths, lx, ly,
            ragged_left, ragged_right, mode=mode, width=width)
    return fb_pass_batch_scan(params, sx, sy, offsets, widths, lx, ly,
                              ragged_left, ragged_right, mode=mode,
                              width=width)


def shard_batch(arrays: dict, mesh=None, axis: str = "data") -> dict:
    """Place batch-leading arrays with a NamedSharding over `axis` so the
    batched FB executes data-parallel across the mesh."""
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}
