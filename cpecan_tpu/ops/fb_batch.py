"""Batched / sharded forward-backward execution.

`fb_pass_batch` vmaps the wavefront engine over a batch of (padded,
same-bucket) pairs. For EM, per-pair expectation tensors are summed over
the batch inside the jit — when the batch axis carries a NamedSharding
over a device mesh, XLA lowers that sum to an AllReduce over ICI: the
TPU-native replacement for the reference's file-gather reduction
(cPecanEm.py:184-188).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cpecan_tpu.ops import fb


@functools.partial(jax.jit, static_argnames=("mode", "width"))
def fb_pass_batch(params, sx, sy, offsets, widths, lx, ly,
                  ragged_left, ragged_right, mode: str = "expectation",
                  width: int = 0):
    """Batch-of-pairs FB. All array args carry a leading batch axis; params
    are broadcast. In expectation mode the returned trans/emis are summed
    over the batch."""
    out = jax.vmap(
        lambda a, b, c, d, e, f, g, h: fb.fb_pass(
            params, a, b, c, d, e, f, g, h, mode=mode, width=width)
    )(sx, sy, offsets, widths, lx, ly, ragged_left, ragged_right)
    if mode == "expectation":
        out["trans"] = jnp.sum(out["trans"], axis=0)
        out["emis"] = jnp.sum(out["emis"], axis=0)
    return out


def shard_batch(arrays: dict, mesh=None, axis: str = "data") -> dict:
    """Place batch-leading arrays with a NamedSharding over `axis` so the
    batched FB executes data-parallel across the mesh."""
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}
