"""Segmented Pallas streaming forward-backward for long pairs.

Same contract and checkpoint/recompute scheme as the scan-based
streaming engine (ops/fb_streaming.py — the TPU re-design of the
reference's traceback windowing, impl/pairwiseAligner.c:756-877,
window logic :792-861), but every window body executes inside the fused
wavefront kernels (ops/fb_wavefront.py) instead of a lax.scan:

  Pass A (forward): one _fwd_kernel launch per window with fresh=False,
    the (F_{k0-1}, F_{k0-2}, 1/m_{k0-1}) segment carry arriving through
    the kernel's carry-in refs and leaving through its carry-out refs.
    Only the per-window entry carries ("checkpoints", ~2*S*W floats) and
    the per-diagonal log-scale/end-dot streams are kept.

  Pass B (backward): windows high-to-low. Each window re-runs the
    forward kernel from its checkpoint to regenerate the window's F and
    bridge-vector blocks, then runs _bwd_kernel with the TRUE backward
    state (B, B_next, 1/mb, em_next, bridgevec_next) carried across the
    window boundary via its carry-in/out refs — posteriors are exact,
    not burn-in approximations (same deliberate divergence from the
    reference's fresh-matrix traceback seeding as ops/fb_streaming.py).

The window rows are processed at full kernel speed (the whole window's
diagonal recursion runs inside one Pallas program over VMEM carries);
the only HBM-resident tensors are one window's streams and F block, so
memory stays O(window * band) for arbitrarily long pairs.

Host-link discipline (the measured cost model of the remote-TPU path:
queued dispatches are ~0.4 ms each, but EVERY host sync is a ~23 ms
round trip and device-to-host moves ~50 MB/s): both passes enqueue all
window launches without a single sync, posteriors are compacted to
(index, value) entry lists ON DEVICE (only >= threshold entries ever
cross the link), and everything is fetched in a handful of batched
device_get round trips at the end. Windows whose entry count overflows
the fixed compaction capacity are re-run dense from their saved carries
(rare: capacity is ~8 entries per diagonal).

Numerics are identical to the scan streaming engine (same recurrence,
same normalization), which doubles as this module's test oracle
(tests/test_streaming.py runs both and compares).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpecan_tpu.ops import compact
from cpecan_tpu.utils import hostlink
from cpecan_tpu.ops import fb as _fb
from cpecan_tpu.ops import fb_wavefront as _wf
from cpecan_tpu.ops.fb_streaming import _host_frame, _pad_frame


def supported(mode: str) -> bool:
    return mode in ("forward", "posterior_match", "posterior_all",
                    "expectation")


def seg_chunk(W: int) -> int:
    """Diagonal chunk per grid step (G=1: a single pair rides the
    group/sublane slot, the band W the lanes)."""
    return max(8, min(_wf.CHUNK,
                      (_wf._envelope(max(W, 128)) // max(W, 128)) // 8 * 8))


def _prep_window(params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
                 k0, LY, L, K, W, want_bwd):
    """Kernel input streams for rows [k0, k0+K) (the per-window analog of
    fb_wavefront._precompute_one, sliced from the padded global frame)."""
    prob = _fb._prob_params(params)
    sl = lambda a, off=0: jax.lax.dynamic_slice(a, (k0 + off,), (K,))
    xoff = sl(xoff_g)
    delta = sl(delta_g)
    d_km1 = sl(delta_g, -1)
    jlo = sl(jlo_g)
    jhi = sl(jhi_g)
    ks = k0 + jnp.arange(K, dtype=jnp.int32)
    # callers pad both sequence ends with K + W + 1 sentinels: enough for
    # the slab-matmul windows (TPU) and passed through to the scan (CPU)
    pad_off = K + W + 1
    if jax.default_backend() == "tpu":
        wx, wy = _fb._symbol_windows_slab(sx_pad, sy_pad, xoff, delta, LY,
                                          W, ks, pad_off, K_rows=K)
    else:
        wx, wy = _fb._symbol_windows_scan(sx_pad, sy_pad, xoff, delta, LY,
                                          W, ks=ks, pad_off=pad_off)
    e_x, e_y, e_m = _fb._emissions(prob, wx[:, :W], wy[:, 1:])

    js = jnp.arange(W, dtype=jnp.int32)
    slot_ok = ((js[None, :] >= jlo[:, None])
               & (js[None, :] <= jhi[:, None]))
    fm = slot_ok.astype(jnp.float32)

    dmid = delta + d_km1 - 1
    i8 = lambda cond: jnp.broadcast_to(
        cond[:, None], (K, W)).astype(jnp.int8)
    out = dict(ex=e_x * fm, ey=e_y * fm, em=e_m * fm,
               a=i8(delta == 1), b1=i8(dmid == 1), b0=i8(dmid == 0),
               wx=wx[:, :W].astype(jnp.int32),
               wy=wy[:, 1:].astype(jnp.int32))
    if not want_bwd:
        return out, prob

    ef_x, ef_y, ef_m = _fb._emissions(prob, wx[:, 1:], wy[:, :W])
    d1 = sl(delta_g, 1)
    d2 = sl(delta_g, 2)
    dsum2 = d1 + d2
    dmid1 = d1 + delta - 1
    out.update(efx=ef_x * fm, efy=ef_y * fm, efm=ef_m * fm,
               abw=i8(d1 == 1), c1=i8(dsum2 == 2), c0=i8(dsum2 == 1),
               bm1=i8(dmid1 == 1), bm0=i8(dmid1 == 0))

    xs = xoff[:, None] + js[None, :]
    ys = ks[:, None] - xs
    valid_k = ((ks >= 1) & (ks <= L))[:, None]
    pm = (jnp.where(valid_k & slot_ok & (xs > 0) & (ys > 0),
                    _wf._PM_MATCH, 0)
          | jnp.where(valid_k & slot_ok & (xs > 0), _wf._PM_GAPX, 0)
          | jnp.where(valid_k & slot_ok & (ys > 0), _wf._PM_GAPY, 0)
          | jnp.where((ks == L)[:, None], _wf._PM_ATEND, 0)
          | jnp.where(((ks >= 1) & (ks < L))[:, None], _wf._PM_BRIDGE, 0))
    out["pm"] = pm.astype(jnp.int8)
    return out, prob


def _end_row(prob, jlo_g, jhi_g, L, ragged_right, S, W):
    end_vec = jnp.where(ragged_right, prob["ragged_end"], prob["end"])
    js = jnp.arange(W, dtype=jnp.int32)
    sok = ((js >= jlo_g[L]) & (js <= jhi_g[L])).astype(jnp.float32)
    return end_vec[:, None] * sok[None, :], end_vec


def _to4(arr):
    """(K, ...) stream -> (1, K, 1, ...) kernel layout (NG=1, G=1)."""
    return arr[:, None][None]


def _fwd_call(t_prob, streams, carry, S, nz, K, W, chunk, interpret):
    """One forward-kernel launch over a window (fresh=False).
    carry: (f1 (S,W), f2 (S,W), invm (1,1)). Returns F block
    (K, S, W), bridgevec (K, W), mf (K,), carry_out."""
    NC = K // chunk
    vmem = pltpu.VMEM
    row_spec = lambda last: pl.BlockSpec(
        (1, chunk, 1) + last, lambda g, c: (g, c, 0) + (0,) * len(last),
        memory_space=vmem)
    const = lambda shp: pl.BlockSpec(
        shp, lambda g, c: (0,) * len(shp), memory_space=vmem)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # transitions
            row_spec((W,)), row_spec((W,)), row_spec((W,)),  # ex ey em
            row_spec((W,)), row_spec((W,)), row_spec((W,)),  # a b1 b0
            const((1, S, 1, W)),  # f0 = F_{k0-1}
            const((1, S, 1, W)),  # ci2 = F_{k0-2}
            const((1, 1, 1)),     # cim = 1/m_{k0-1}
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, S, 1, W),
                         lambda g, c: (g, c, 0, 0, 0), memory_space=vmem),
            row_spec((W,)),  # bridgevec
            row_spec((1,)),  # mf
            const((1, S, 1, W)), const((1, S, 1, W)), const((1, 1, 1)),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, 1, W), jnp.float32),
            pltpu.VMEM((S, 1, W), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
    )

    def wrapper(*refs):
        ins = refs[:10]
        outs = refs[10:16]
        scr = refs[16:]
        _wf._fwd_kernel(*ins, *outs, *scr, S=S, nz=nz, chunk=chunk,
                        fresh=False, phase=1)

    f1, f2, invm = carry
    F, bv, mf, co1, co2, com = pl.pallas_call(
        wrapper,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((1, K, S, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, K, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, K, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, S, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, S, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(t_prob, _to4(streams["ex"]), _to4(streams["ey"]), _to4(streams["em"]),
      _to4(streams["a"]), _to4(streams["b1"]), _to4(streams["b0"]),
      f1[None, :, None, :], f2[None, :, None, :], invm[None])
    carry_out = (co1[0, :, 0, :], co2[0, :, 0, :], com[0])
    return F, bv, mf, carry_out


@functools.partial(
    jax.jit,
    static_argnames=("S", "nz", "K", "W", "chunk", "interpret"))
def _seg_fwd_jit(params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
                 k0, LY, L, ragged_right, f1, f2, invm,
                 S, nz, K, W, chunk, interpret):
    """Pass-A window: advance the forward carry over K rows via the
    wavefront kernel; returns (carry_out, mf_win, fe_win)."""
    streams, prob = _prep_window(
        params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
        k0, LY, L, K, W, want_bwd=False)
    t_prob = jnp.exp(params["t"]).reshape(3 * S, S)
    F, _bv, mf, carry_out = _fwd_call(
        t_prob, streams, (f1, f2, invm), S, nz, K, W, chunk, interpret)
    end_vec = jnp.where(ragged_right, prob["ragged_end"], prob["end"])
    fe = jnp.log(jnp.einsum("ksj,s->k", F[0, :, :, 0, :], end_vec,
                            precision=jax.lax.Precision.HIGHEST))
    return carry_out, mf[0, :, 0, 0], fe


@functools.partial(
    jax.jit,
    static_argnames=("S", "nz", "K", "W", "chunk", "mode", "interpret",
                     "cap"))
def _seg_bwd_jit(params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
                 k0, LY, L, ragged_right, thr, carry_f, carry_b,
                 S, nz, K, W, chunk, mode, interpret, cap):
    """Pass-B window: forward-kernel recompute from the checkpoint
    carry_f, then the backward+posterior kernel with the exact backward
    carry_b across the window boundary.

    cap > 0 compacts each posterior block on device to its >= thr
    entries — (idx, vals, count) of fixed size cap per key — so only
    thresholded entries cross the host link; cap=0 returns the dense
    (K, W) blocks."""
    streams, prob = _prep_window(
        params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
        k0, LY, L, K, W, want_bwd=True)
    t_prob = jnp.exp(params["t"]).reshape(3 * S, S)
    F, bv, _mf, _co = _fwd_call(
        t_prob, streams, carry_f, S, nz, K, W, chunk, interpret)
    end_row, _ = _end_row(prob, jlo_g, jhi_g, L, ragged_right, S, W)

    NC = K // chunk
    n_out = 3 if mode == "posterior_all" else 1
    vmem = pltpu.VMEM
    rrow = lambda last: pl.BlockSpec(
        (1, chunk, 1) + last,
        lambda g, c: (g, NC - 1 - c, 0) + (0,) * len(last),
        memory_space=vmem)
    const = lambda shp: pl.BlockSpec(
        shp, lambda g, c: (0,) * len(shp), memory_space=vmem)
    cin = [const((1, S, 1, W)), const((1, S, 1, W)), const((1, 1, 1)),
           const((1, 1, W)), const((1, 1, W))]

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # transitions
            rrow((W,)), rrow((W,)), rrow((W,)),  # ef*
            rrow((W,)),  # em
            pl.BlockSpec((1, chunk, S, 1, W),
                         lambda g, c: (g, NC - 1 - c, 0, 0, 0),
                         memory_space=vmem),  # F
            rrow((W,)),  # bridgevec
            rrow((W,)), rrow((W,)), rrow((W,)),  # abw c1 c0
            rrow((W,)), rrow((W,)), rrow((W,)),  # bm1 bm0 pm
            const((1, S, 1, W)),  # end row
        ] + cin,
        out_specs=[rrow((W,))] * n_out + [rrow((1,))] * 2 + cin,
        scratch_shapes=[
            pltpu.VMEM((S, 1, W), jnp.float32),
            pltpu.VMEM((S, 1, W), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, W), jnp.float32),
            pltpu.VMEM((1, W), jnp.float32),
        ],
    )

    def wrapper(*refs):
        ins = refs[:14]
        bci = refs[14:19]
        posts_ = refs[19:19 + n_out]
        mbr, totr = refs[19 + n_out:21 + n_out]
        bco = refs[21 + n_out:26 + n_out]
        scr = refs[26 + n_out:]
        if n_out == 1:
            posts_ = (posts_[0], None, None)
        _wf._bwd_kernel(*ins, tuple(bci), *posts_, mbr, totr, tuple(bco),
                        *scr, S=S, nz=nz, chunk=chunk, mode=mode, phase=1)

    b1, b2, invb, emn, bvn = carry_b
    outs = pl.pallas_call(
        wrapper,
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((1, K, 1, W), jnp.float32)] * n_out
        + [jax.ShapeDtypeStruct((1, K, 1, 1), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, S, 1, W), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, 1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, 1, W), jnp.float32)] * 2,
        interpret=interpret,
    )(t_prob, _to4(streams["efx"]), _to4(streams["efy"]),
      _to4(streams["efm"]), _to4(streams["em"]), F, bv,
      _to4(streams["abw"]), _to4(streams["c1"]), _to4(streams["c0"]),
      _to4(streams["bm1"]), _to4(streams["bm0"]), _to4(streams["pm"]),
      end_row[None, :, None, :],
      b1[None, :, None, :], b2[None, :, None, :], invb[None],
      emn[None], bvn[None])

    posts = [o[0, :, 0, :] for o in outs[:n_out]]
    mb = outs[n_out][0, :, 0, 0]
    tot = outs[n_out + 1][0, :, 0, 0]
    bo1, bo2, boi, boem, bobv = outs[n_out + 2:n_out + 7]
    carry_out = (bo1[0, :, 0, :], bo2[0, :, 0, :], boi[0],
                 boem[0], bobv[0])
    out = {"mb": mb, "total_raw": tot, "carry_b": carry_out}
    keys = (("post_match", "post_gap_x", "post_gap_y")[:n_out])
    for k, v in zip(keys, posts):
        if cap:
            out[k] = compact.compact_rows(v, thr, cap)
        else:
            out[k] = v
    return out


@functools.partial(
    jax.jit,
    static_argnames=("S", "nz", "K", "W", "chunk", "interpret"))
def _seg_exp_jit(params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
                 k0, LY, L, ragged_right, adj1, adj2, carry_f, carry_b,
                 S, nz, K, W, chunk, interpret):
    """Pass-B expectation window: forward-kernel recompute from the
    checkpoint, then the backward+expectation kernel with the segment
    carries and the checkpoint rows as the below-segment F halo.
    adj1/adj2: (K, 1) neighbor scale adjustments exp(-mf_k) /
    exp(-(mf_k + mf_{k-1})) from the exact pass-A scale stream, zeroed
    at global k<1 / k<2."""
    streams, prob = _prep_window(
        params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
        k0, LY, L, K, W, want_bwd=True)
    t_prob = jnp.exp(params["t"]).reshape(3 * S, S)
    F, bv, _mf, _co = _fwd_call(
        t_prob, streams, carry_f, S, nz, K, W, chunk, interpret)
    end_row, _ = _end_row(prob, jlo_g, jhi_g, L, ragged_right, S, W)

    CH = max(8, chunk // 2)
    NC = K // CH
    vmem = pltpu.VMEM
    erow = lambda last: pl.BlockSpec(
        (1, CH, 1) + last,
        lambda g, c: (g, NC - 1 - c, 0) + (0,) * len(last),
        memory_space=vmem)
    const = lambda shp: pl.BlockSpec(
        shp, lambda g, c: (0,) * len(shp), memory_space=vmem)
    halo_spec = pl.BlockSpec(
        (1, 2, S, 1, W),
        lambda g, c: (g, jnp.maximum((NC - 1 - c) * (CH // 2) - 1, 0),
                      0, 0, 0),
        memory_space=vmem)
    cin = [const((1, S, 1, W)), const((1, S, 1, W)), const((1, 1, 1)),
           const((1, 1, W)), const((1, 1, W))]

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # transitions
            erow((W,)), erow((W,)), erow((W,)),  # ef*
            erow((W,)), erow((W,)), erow((W,)),  # em ex ey
            pl.BlockSpec((1, CH, S, 1, W),
                         lambda g, c: (g, NC - 1 - c, 0, 0, 0),
                         memory_space=vmem),  # F
            halo_spec,  # F halo (block-relative)
            const((1, 2, S, 1, W)),  # carry halo (rows k0-2, k0-1)
            erow((W,)),  # bridgevec
            erow((W,)), erow((W,)), erow((W,)),  # abw c1 c0
            erow((W,)), erow((W,)),  # bm1 bm0
            erow((W,)), erow((W,)), erow((W,)),  # a b1 b0
            erow((W,)),  # pm
            const((1, S, 1, W)),  # end rows
            erow((1,)), erow((1,)),  # adj1 adj2
            erow((W,)), erow((W,)),  # wx wy
        ] + cin,
        out_specs=[
            erow((1,)), erow((1,)),  # mb, total_raw
            pl.BlockSpec((1, S, S), lambda g, c: (g, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, S, 4, 4), lambda g, c: (g, 0, 0, 0),
                         memory_space=vmem),
        ] + cin,
        scratch_shapes=[
            pltpu.VMEM((S, 1, W), jnp.float32),
            pltpu.VMEM((S, 1, W), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, W), jnp.float32),
            pltpu.VMEM((1, W), jnp.float32),
            pltpu.VMEM((len(nz), 1, W), jnp.float32),
            pltpu.VMEM((S * 16, 1, W), jnp.float32),
        ],
    )

    def wrapper(*refs):
        ins = refs[:25]
        bci = refs[25:30]
        outs = refs[30:34]
        bco = refs[34:39]
        scr = refs[39:]
        _wf._exp_kernel(*ins, tuple(bci), *outs, tuple(bco), *scr,
                        S=S, nz=nz, chunk=CH, phase=1)

    f1, f2, _invm = carry_f
    fhc = jnp.stack([f2, f1])[None, :, :, None, :]
    b1, b2, invb, emn, bvn = carry_b
    outs = pl.pallas_call(
        wrapper,
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((1, K, 1, 1), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, S, S), jnp.float32),
           jax.ShapeDtypeStruct((1, S, 4, 4), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, S, 1, W), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, 1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, 1, W), jnp.float32)] * 2,
        interpret=interpret,
    )(t_prob, _to4(streams["efx"]), _to4(streams["efy"]),
      _to4(streams["efm"]), _to4(streams["em"]), _to4(streams["ex"]),
      _to4(streams["ey"]), F, F, fhc, bv,
      _to4(streams["abw"]), _to4(streams["c1"]), _to4(streams["c0"]),
      _to4(streams["bm1"]), _to4(streams["bm0"]),
      _to4(streams["a"]), _to4(streams["b1"]), _to4(streams["b0"]),
      _to4(streams["pm"]), end_row[None, :, None, :],
      adj1[None, :, None, :], adj2[None, :, None, :],
      _to4(streams["wx"]), _to4(streams["wy"]),
      b1[None, :, None, :], b2[None, :, None, :], invb[None],
      emn[None], bvn[None])

    mb = outs[0][0, :, 0, 0]
    tot = outs[1][0, :, 0, 0]
    trans = outs[2][0]
    emis = outs[3][0]
    bo1, bo2, boi, boem, bobv = outs[4:9]
    carry_out = (bo1[0, :, 0, :], bo2[0, :, 0, :], boi[0],
                 boem[0], bobv[0])
    return {"mb": mb, "total_raw": tot, "trans": trans, "emis": emis,
            "carry_b": carry_out}


@functools.partial(jax.jit, static_argnames=("S", "W"))
def _init_carry_jit(params, ragged_left, S, W):
    prob = _fb._prob_params(params)
    start_vec = jnp.where(ragged_left, prob["ragged_start"], prob["start"])
    F0 = jnp.zeros((S, W), jnp.float32).at[:, 0].set(start_vec)
    m0 = jnp.max(F0)
    m0 = jnp.where(m0 > 0, m0, 1.0)
    carry = (F0 / m0, jnp.zeros((S, W), jnp.float32),
             jnp.ones((1, 1), jnp.float32))
    return carry, jnp.log(m0)


def fb_pass_segmented(params, seq_x_codes, seq_y_codes,
                      offsets: np.ndarray, widths: np.ndarray,
                      lx: int, ly: int, ragged_left: bool,
                      ragged_right: bool, mode: str, width: int,
                      window: int, threshold: float = 0.0,
                      interpret: bool | None = None):
    """Streaming banded FB for ONE long pair on the wavefront kernels.

    Same arguments and return contract as
    fb_streaming.fb_pass_streaming (which see) for the supported()
    modes. `interpret=None` auto-selects Pallas interpreter mode
    off-TPU so parity tests run the kernel code path on CPU.
    """
    if not supported(mode):
        raise ValueError(f"segmented engine does not support mode={mode!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nz = _wf.nonzero_transitions_of(params["t"])
    S = int(params["start"].shape[0])
    W = int(width)
    chunk = seg_chunk(W)
    K = -(-int(window) // chunk) * chunk
    L = int(lx) + int(ly)
    if L == 0:
        raise ValueError("empty pair")
    nW = -(-L // K)  # windows cover rows [1, 1 + nW*K) ⊇ [1, L]
    rows_total = 1 + nW * K

    xoff, delta, jlo, jhi = _host_frame(np.asarray(offsets),
                                        np.asarray(widths))
    xoff, delta, jlo, jhi = _pad_frame(xoff, delta, jlo, jhi, rows_total)

    sx = np.asarray(seq_x_codes, np.int8)
    sy = np.asarray(seq_y_codes, np.int8)
    pad = np.full(K + W + 1, _fb._SENTINEL, np.int8)
    sx_pad = jnp.asarray(np.concatenate([pad, sx, pad]))
    sy_pad = jnp.asarray(np.concatenate([pad, sy[::-1], pad]))
    LY = int(ly)

    dev = jnp.asarray
    xoff_d, delta_d = dev(xoff), dev(delta)
    jlo_d, jhi_d = dev(jlo), dev(jhi)
    ja = jnp.int32

    carry, m0log = _init_carry_jit(params, bool(ragged_left), S, W)

    # ---- pass A: forward kernels, keeping carries + scale streams.
    # Every launch is enqueued without a host sync; the scale/end-dot
    # streams come back in ONE batched device_get round trip.
    checkpoints = []
    mf_parts = []
    fe_parts = []
    for w in range(nW):
        k0 = 1 + w * K
        checkpoints.append(carry)
        carry, mf_win, fe_win = _seg_fwd_jit(
            params, sx_pad, sy_pad, xoff_d, delta_d, jlo_d, jhi_d,
            ja(k0), ja(LY), ja(L), bool(ragged_right), *carry,
            S=S, nz=nz, K=K, W=W, chunk=chunk, interpret=interpret)
        mf_parts.append(mf_win)
        fe_parts.append(fe_win)
    mf_h, fe_h, m0_h = hostlink.device_get_pipelined(
        (jnp.concatenate(mf_parts), jnp.concatenate(fe_parts), m0log))
    mf_full = np.concatenate([np.asarray(m0_h, np.float64)[None],
                              mf_h.astype(np.float64)])  # rows 0..nW*K
    mf = mf_full[: L + 1]
    log_fwd = float(fe_h[L - 1])  # fe index 0 is row 1

    out = {"log_fwd": log_fwd, "mf": mf, "windows": nW}
    if mode == "forward":
        out["mb"] = np.zeros(L + 1)
        return out

    if mode == "expectation":
        zerosw = jnp.zeros((S, W), jnp.float32)
        carry_b = (zerosw, zerosw, jnp.ones((1, 1), jnp.float32),
                   jnp.zeros((1, W), jnp.float32),
                   jnp.zeros((1, W), jnp.float32))
        trans_acc = None
        emis_acc = None
        rows_out = []
        ks_all = np.arange(len(mf_full))
        for w in range(nW - 1, -1, -1):
            k0 = 1 + w * K
            ks = ks_all[k0:k0 + K]
            a1 = np.exp(-mf_full[ks]) * (ks >= 1)
            a2 = np.exp(-(mf_full[ks] + mf_full[ks - 1])) * (ks >= 2)
            res = _seg_exp_jit(
                params, sx_pad, sy_pad, xoff_d, delta_d, jlo_d, jhi_d,
                ja(k0), ja(LY), ja(L), bool(ragged_right),
                jnp.asarray(a1[:, None], jnp.float32),
                jnp.asarray(a2[:, None], jnp.float32),
                checkpoints[w], carry_b,
                S=S, nz=nz, K=K, W=W, chunk=chunk, interpret=interpret)
            carry_b = res.pop("carry_b")
            trans_acc = (res["trans"] if trans_acc is None
                         else trans_acc + res["trans"])
            emis_acc = (res["emis"] if emis_acc is None
                        else emis_acc + res["emis"])
            rows_out.append((k0, res["mb"], res["total_raw"]))
        fetched = hostlink.device_get_pipelined(
            (trans_acc, emis_acc, [(r[1], r[2]) for r in rows_out]))
        mb = np.zeros(L + 1)
        total_raw = np.full(L + 1, -np.inf)
        for (k0, _m, _t), (mb_w, tot_w) in zip(rows_out, fetched[2]):
            hi = min(k0 + K, L + 1)
            if hi > k0:
                mb[k0:hi] = mb_w[: hi - k0].astype(np.float64)
                total_raw[k0:hi] = tot_w[: hi - k0].astype(np.float64)
        out["mb"] = mb
        out["total_raw"] = total_raw
        out["trans"] = fetched[0].astype(np.float64)
        out["emis"] = fetched[1].astype(np.float64)
        return out

    # ---- pass B: backward windows high-to-low. Posterior blocks are
    # compacted to entry lists on device; all windows' results are
    # fetched in batched device_get round trips after the launch loop.
    zerosw = jnp.zeros((S, W), jnp.float32)
    carry_b = (zerosw, zerosw, jnp.ones((1, 1), jnp.float32),
               jnp.zeros((1, W), jnp.float32), jnp.zeros((1, W), jnp.float32))
    keys = (("post_match",) if mode == "posterior_match" else
            ("post_match", "post_gap_x", "post_gap_y"))
    thr = max(float(threshold), 1e-9)
    cap = int(min(K * W, max(4096, 8 * K)))
    thr_j = jnp.float32(thr)

    results = []  # (w, k0, res dict of device arrays)
    bwd_carries = []  # carry_b entering window w (for overflow re-runs)
    for w in range(nW - 1, -1, -1):
        k0 = 1 + w * K
        bwd_carries.append(carry_b)
        res = _seg_bwd_jit(
            params, sx_pad, sy_pad, xoff_d, delta_d, jlo_d, jhi_d,
            ja(k0), ja(LY), ja(L), bool(ragged_right), thr_j,
            checkpoints[w], carry_b,
            S=S, nz=nz, K=K, W=W, chunk=chunk, mode=mode,
            interpret=interpret, cap=cap)
        carry_b = res.pop("carry_b")
        results.append((w, k0, res))
    bwd_carries.reverse()  # index by w

    mb = np.zeros(L + 1)
    total_raw = np.full(L + 1, -np.inf)
    entries = {k: ([], [], []) for k in keys}
    fetched = hostlink.device_get_pipelined([r for (_w, _k0, r) in results])
    for (w, k0, _r), res in zip(results, fetched):
        hi = min(k0 + K, L + 1)
        n_rows = hi - k0
        if n_rows > 0:
            mb[k0:hi] = res["mb"][:n_rows].astype(np.float64)
            total_raw[k0:hi] = res["total_raw"][:n_rows].astype(np.float64)
        dense = {}
        if any(int(res[key][2]) > cap
               or int(res[key][3]) > compact.DEFAULT_SLOTS
               for key in keys):
            # capacity or per-row slot overflow: re-run this window
            # dense from its saved carries
            redo = _seg_bwd_jit(
                params, sx_pad, sy_pad, xoff_d, delta_d, jlo_d, jhi_d,
                ja(k0), ja(LY), ja(L), bool(ragged_right), thr_j,
                checkpoints[w], bwd_carries[w],
                S=S, nz=nz, K=K, W=W, chunk=chunk, mode=mode,
                interpret=interpret, cap=0)
            dense = {key: np.asarray(redo[key]) for key in keys}
        for key in keys:
            if key in dense:
                ks_loc, js_loc = np.nonzero(dense[key] >= thr)
                vals = dense[key][ks_loc, js_loc]
            else:
                idx, vals = res[key][0], res[key][1]
                sel = idx >= 0
                idx, vals = idx[sel], vals[sel]
                ks_loc, js_loc = idx // W, idx % W
            entries[key][0].append(vals)
            entries[key][1].append(ks_loc + k0)
            entries[key][2].append(js_loc)

    out["mb"] = mb
    out["total_raw"] = total_raw
    out["xoff"] = xoff
    out["post_entries"] = {
        key: tuple(np.concatenate(parts) if parts else np.zeros(0)
                   for parts in entries[key])
        for key in keys}
    return out
