"""Cross-pair batched posterior alignment.

The reference processes one cigar at a time through the banded engine
(cPecanRealign.c main loop). On TPU that leaves the chip idle between
tiny launches, so here many pairs' band chunks are flattened into
shape-bucketed device batches: every chunk produced by large-gap
splitting (align/split.py) across *all* jobs becomes one row of a
(padded diagonals, padded width) bucket, each bucket runs through
fb_batch.fb_pass_batch once (the Pallas wavefront engine on TPU), and
posterior pairs scatter back to their jobs with the chunk coordinate
shifts. This is the read-pairs/sec path the CLIs use.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np
import jax.numpy as jnp

from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.state_machine import StateMachine
from cpecan_tpu.align.pairwise import (
    _bucket, _iterate_chunks, _width_bucket)
from cpecan_tpu.ops import fb_batch, fb_streaming
from cpecan_tpu.ops import pairs as pairs_mod
from cpecan_tpu.ops.band import construct_band, full_band, pad_band
from cpecan_tpu.utils import metrics
from cpecan_tpu.utils.symbols import encode


@dataclasses.dataclass
class _Task:
    job: int
    x1: int
    y1: int
    sub_x: str
    sub_y: str
    anchors: list
    ragged_left: bool
    ragged_right: bool


@jax.jit
def _count_above(post, thr):
    return jnp.sum(post >= thr, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("k",))
def _compact_above(post, thr, k):
    """Per-batch-row indices and values of posterior entries >= thr
    (fixed size k, -1 padded) — sparsifies on device so only the
    above-threshold entries cross the host link."""
    def one(pm):
        flat = pm.reshape(-1)
        idx = jnp.nonzero(flat >= thr, size=k, fill_value=-1)[0]
        vals = flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
        return idx.astype(jnp.int32), vals
    return jax.vmap(one)(post)


def _sparse_to_pairs(idx_row, val_row, offsets64, W, L, ox, oy):
    """Host decode of compacted posterior entries into a pair array
    (addPosteriorProb semantics, matching extract_pairs_from_posteriors)."""
    sel = idx_row >= 0
    idx = idx_row[sel]
    vals = val_row[sel]
    ks = idx // W
    js = idx % W
    keep = ks <= L
    ks, js, vals = ks[keep], js[keep], vals[keep]
    xoff = pairs_mod.frame_offsets(offsets64)
    xs = xoff[ks] + js
    ys = ks - xs
    p = np.minimum(vals, 1.0)
    from cpecan_tpu.utils.logmath import PAIR_ALIGNMENT_PROB_1
    return pairs_mod.make_pairs(
        np.floor(p.astype(np.float64) * PAIR_ALIGNMENT_PROB_1).astype(np.int64),
        xs - 1 + ox, ys - 1 + oy)


# Dense posterior outputs (B x (P+1) x W floats per mode output) live on
# device until sparsified; launches are split and flushed so the bytes
# queued stay bounded — wide full-band workloads can't exhaust HBM, while
# small buckets still pipeline across launches.
_DENSE_BUDGET = 1 << 30


def _batch_bucket_size(n: int) -> int:
    """Pad batch sizes to powers of two (bounds the number of compiled
    shapes per (P, W) bucket)."""
    b = 1
    while b < n:
        b *= 2
    return b


def _stream_entries_to_pairs(entries, xoff, L, ox, oy):
    """Streaming-engine sparse posterior entries -> pair array with the
    chunk coordinate shift (same fixed-point semantics as
    _sparse_to_pairs)."""
    from cpecan_tpu.utils.logmath import PAIR_ALIGNMENT_PROB_1

    vals, ks, js = entries
    keep = ks <= L
    vals, ks, js = vals[keep], ks[keep], js[keep]
    xs = xoff[ks] + js
    ys = ks - xs
    p = np.minimum(vals, 1.0)
    return pairs_mod.make_pairs(
        np.floor(p.astype(np.float64) * PAIR_ALIGNMENT_PROB_1).astype(np.int64),
        xs - 1 + ox, ys - 1 + oy)


def _run_streaming_task(params, t, band, p, mode, keys):
    """One long pair chunk through the checkpointed streaming engine
    (ops/fb_streaming.py) — fixed memory for arbitrarily long chunks."""
    W = _width_bucket(band.frame_width())
    from cpecan_tpu.ops import fb_parallel

    out = fb_streaming.fb_pass_streaming(
        params, encode(t.sub_x), encode(t.sub_y), band.offsets, band.widths,
        len(t.sub_x), len(t.sub_y), t.ragged_left, t.ragged_right,
        mode, W, fb_streaming.window_rows(p), threshold=p.threshold,
        burnin=fb_parallel.burnin_rows(p))
    metrics.add("dp_cells", int(band.widths.sum()))
    metrics.add("streamed_chunks", 1)
    L = band.diagonal_number
    return [_stream_entries_to_pairs(out["post_entries"][k], out["xoff"],
                                     L, t.x1, t.y1)
            for k in keys]


def _expand_jobs(jobs, p):
    tasks = []
    for ji, (seq_x, seq_y, anchor_pairs, rl0, rr0) in enumerate(jobs):
        if anchor_pairs is None:
            # full-band job (the reference's unbanded small-matrix path):
            # whole rectangle, no splitting
            tasks.append(_Task(ji, 0, 0, seq_x, seq_y, None, rl0, rr0))
            continue
        for (x1, y1, x2, y2), local, rl, rr in _iterate_chunks(
                seq_x, seq_y, anchor_pairs, p, rl0, rr0):
            if x2 - x1 == 0 and y2 - y1 == 0:
                continue
            tasks.append(_Task(ji, x1, y1, seq_x[x1:x2], seq_y[y1:y2],
                               local, rl, rr))
    return tasks


def batch_posteriors(sm: StateMachine, jobs, p: PairwiseAlignmentParameters,
                     mode: str = "posterior_match", mesh=None):
    """Run all jobs' band chunks through shape-bucketed device batches.

    jobs: iterable of (seq_x, seq_y, anchor_pairs, ragged_left,
    ragged_right); anchor_pairs=None runs the job full-band (whole
    rectangle, no splitting). Returns, per job, the thresholded posterior pair
    array(s): one array in posterior_match mode, a (match, gap_x, gap_y)
    triple in posterior_all mode. With a mesh, each bucket's batch is
    padded to the device count and sharded over the "data" axis.
    """
    n_out = 3 if mode == "posterior_all" else 1
    keys = (("post_match", "post_gap_x", "post_gap_y")[:n_out])
    results = [[[] for _ in jobs] for _ in range(n_out)]

    tasks = _expand_jobs(jobs, p)
    params = sm.device_params()
    buckets: dict = {}
    for t in tasks:
        if t.anchors is None:
            band = full_band(len(t.sub_x), len(t.sub_y))
        elif p.dynamicAnchorExpansion:
            band = construct_band(t.anchors, len(t.sub_x), len(t.sub_y),
                                  expansion=None)
        else:
            band = construct_band([(a[0], a[1]) for a in t.anchors],
                                  len(t.sub_x), len(t.sub_y),
                                  p.diagonalExpansion)
        W = _width_bucket(band.frame_width())
        if fb_streaming.should_stream(band.diagonal_number, W):
            # chunk too long for the two-pass engines: checkpointed
            # streaming in fixed memory (reference traceback windowing)
            for oi, pairs in enumerate(_run_streaming_task(
                    params, t, band, p, mode, keys)):
                results[oi][t.job].append(pairs)
            continue
        P = _bucket(band.diagonal_number)
        buckets.setdefault((P, W), []).append((t, band))

    # Three phases so bucket i's host syncs overlap bucket j's device
    # compute (the device queue is async; each forced value is a host
    # round-trip that would otherwise serialize per bucket).
    n_dev = 1 if mesh is None else mesh.devices.size
    pending = []  # (items, offs_per, out, counts) per launch
    pending_bytes = 0

    def flush():
        """Phases 2+3 for everything queued: sparsify on device — only
        the >= threshold entries cross the host link (the dense
        posteriors can be 100x larger) — then emit host pair arrays."""
        nonlocal pending, pending_bytes
        compacted = []
        for items, offs_per, out, counts in pending:
            sparse_dev = []
            for k, cnt in zip(keys, counts):
                n_above = int(np.max(np.asarray(cnt)[: len(items)],
                                     initial=0))
                kk = _batch_bucket_size(max(n_above, 64))
                sparse_dev.append(_compact_above(out[k], p.threshold, kk))
            Wp = out[keys[0]].shape[2]
            compacted.append((items, offs_per, Wp, sparse_dev))

        for items, offs_per, Wp, sparse_dev in compacted:
            sparse = [(np.asarray(idx), np.asarray(vals))
                      for idx, vals in sparse_dev]
            for i, (t, band) in enumerate(items):
                L = band.diagonal_number
                for oi in range(n_out):
                    idx, vals = sparse[oi]
                    results[oi][t.job].append(_sparse_to_pairs(
                        idx[i], vals[i], offs_per[i], Wp, L, t.x1, t.y1))
        pending = []
        pending_bytes = 0

    dense_budget = _DENSE_BUDGET

    with metrics.stage("fb_pass"):
        launches = []
        for (P, W), items in sorted(buckets.items()):
            bmax = max(1, int(dense_budget // ((P + 1) * W * 4 * n_out)))
            bmax = 1 << (bmax.bit_length() - 1)  # power of two: B == bmax
            bmax = max(bmax, n_dev)
            launches.extend(((P, W), items[s:s + bmax])
                            for s in range(0, len(items), bmax))
        for (P, W), items in launches:
            B = _batch_bucket_size(len(items))
            B = ((B + n_dev - 1) // n_dev) * n_dev
            sx = np.zeros((B, P), np.int32)
            sy = np.zeros((B, P), np.int32)
            offsets = np.zeros((B, P + 1), np.int32)
            offsets[:, 1::2] = 1  # parity-consistent pad rows
            widths = np.ones((B, P + 1), np.int32)
            lx = np.zeros(B, np.int32)
            ly = np.zeros(B, np.int32)
            rl = np.zeros(B, bool)
            rr = np.zeros(B, bool)
            offs_per = []
            for i, (t, band) in enumerate(items):
                o, w, L = pad_band(band, P)
                offsets[i] = o
                widths[i] = w
                offs_per.append(o.astype(np.int64))
                sx[i, : len(t.sub_x)] = encode(t.sub_x)
                sy[i, : len(t.sub_y)] = encode(t.sub_y)
                lx[i] = len(t.sub_x)
                ly[i] = len(t.sub_y)
                rl[i] = t.ragged_left
                rr[i] = t.ragged_right

            metrics.add("dp_cells", int(widths[: len(items)].sum()))
            arrays = dict(sx=sx, sy=sy, offsets=offsets, widths=widths,
                          lx=lx, ly=ly, rl=rl, rr=rr)
            arrays = fb_batch.shard_batch(arrays, mesh)
            out = fb_batch.fb_pass_batch(
                params, jnp.asarray(arrays["sx"]), jnp.asarray(arrays["sy"]),
                jnp.asarray(arrays["offsets"]), jnp.asarray(arrays["widths"]),
                jnp.asarray(arrays["lx"]), jnp.asarray(arrays["ly"]),
                jnp.asarray(arrays["rl"]), jnp.asarray(arrays["rr"]),
                mode=mode, width=W, mesh=mesh)
            counts = [_count_above(out[k], p.threshold) for k in keys]
            pending.append((items, offs_per, out, counts))
            pending_bytes += B * (P + 1) * W * 4 * n_out
            if pending_bytes >= dense_budget:
                flush()
        flush()

    merged = [[pairs_mod.concat_pairs(job_lists) for job_lists in res]
              for res in results]
    if mode == "posterior_match":
        return merged[0]
    return list(zip(*merged))


def get_aligned_pairs_batch(sm: StateMachine, jobs,
                            p: PairwiseAlignmentParameters, mesh=None):
    """Batched get_aligned_pairs_using_anchors over many jobs."""
    return batch_posteriors(sm, jobs, p, mode="posterior_match", mesh=mesh)


def get_aligned_pairs_with_indels_batch(sm: StateMachine, jobs,
                                        p: PairwiseAlignmentParameters,
                                        mesh=None):
    """Batched get_aligned_pairs_with_indels_using_anchors: per job a
    (match, gap_x, gap_y) pair-array triple."""
    return batch_posteriors(sm, jobs, p, mode="posterior_all", mesh=mesh)
