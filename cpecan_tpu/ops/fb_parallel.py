"""Wavefront-parallel posterior decoding of ONE long banded pair.

The sequential engines (ops/fb_streaming.py, ops/fb_segmented.py) walk a
single pair's anti-diagonals one after another — on TPU that leaves the
vector unit latency-bound at ~1 us per diagonal regardless of band
width, because a lone pair occupies one sublane slot of the wavefront
kernels. This module restores the full chip for single long pairs by
cutting the diagonal range into WINDOWS and running them CONCURRENTLY
as the kernels' pair-group (sublane) dimension, each window preceded /
followed by a BURN-IN halo:

  * forward: window w computes rows [k0-B, k0+K+B) starting from a
    neutral (uniform in-band) state two rows before its range; after ~B
    rows the normalized forward vector has forgotten the neutral start
    (the pair-HMM state chain mixes geometrically).
  * backward: the same range walked high-to-low from a neutral state —
    except windows whose range reaches past the final diagonal L, which
    seed exactly from the end distribution and are therefore exact.
  * posteriors are emitted only for the window's own rows [k0, k0+K);
    the halo rows exist purely to converge the state.

This is the reference's own approximation: cPecan seeds a FRESH
backward matrix at every traceback point and trusts it after
`traceBackDiagonals` burn-in diagonals (getPosteriorProbsWithBanding,
impl/pairwiseAligner.c:797-817) — here applied symmetrically to both
directions so that ALL windows run in parallel, which the sequential C
design cannot do. The burn-in defaults to a multiple of that same
parameter. Boundary error decays geometrically in the burn-in length;
tests assert posterior parity vs the exact engine at the production
threshold (tests/test_parallel.py).

Per-diagonal log-scales are window-local in this mode, so global
quantities (log_fwd, mf/mb streams, EM counts) are NOT produced — use
the exact engines for those. Production decode paths only consume
thresholded posterior entries, which is what this returns.

Host-link discipline matches ops/fb_segmented.py: windows are sliced
into group batches under an HBM budget, every slice's entries are
compacted on device, and one batched device_get fetches everything.
"""

from __future__ import annotations

import functools
import os

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

# Emission rows per window: small enough to expose ~50+ windows on a
# 50 kb pair, large enough that the 2*burnin halo stays a minor fraction.
WINDOW_ROWS = 1024

# HBM budget for one slice's forward block (windows are independent, so
# slices just bound peak memory).
_F_BUDGET = 1 << 30


def supported(mode: str) -> bool:
    return mode in ("posterior_match", "posterior_all")


def burnin_rows(p) -> int:
    """Burn-in halo rows from the live config: the reference trusts a
    freshly-seeded backward matrix after traceBackDiagonals diagonals
    (impl/pairwiseAligner.c:797-817). The slowest-mixing direction is a
    long-gap state (extension prob ~0.99), so use 6.4x the reference's
    margin with a 256-row floor: a 96-row halo measured exact on several
    evolved-pair cases but left a 0.028 error on a 0.97 posterior on
    another (tests/test_parallel.py burnin-robustness case) — 160 rows
    cut it to 2e-3 and 256 to exact, matching geometric decay. The halo
    is pure overhead per window, so WINDOW_ROWS scales with it.
    CPECAN_TPU_BURNIN (rows, absolute) overrides in either direction."""
    env = os.environ.get("CPECAN_TPU_BURNIN")
    if env:
        return max(int(env), 8)
    return max((32 * int(p.traceBackDiagonals)) // 5, 256)


def _neutral_row(jlo_row, jhi_row, S, W):
    """Uniform in-band (S, W) state — the burn-in start."""
    js = jnp.arange(W, dtype=jnp.int32)
    ok = ((js >= jlo_row) & (js <= jhi_row)).astype(jnp.float32)
    return jnp.broadcast_to(ok[None, :], (S, W))


def _prep_one(params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
              s, k0, base, K, LY, L, Kp, W, pad_off):
    """Streams for one window's rows [s, s+Kp); posterior emission is
    masked to the window's own rows [k0, k0+K).

    `base` rebases the window onto a local W-lane frame: slot j' here is
    global frame slot j' + base (the global frame is as wide as the
    band's widest row, but a 512-row window only spans its local drift —
    narrow-band windows run on narrow tiles; see fb_pass_parallel)."""
    prob = _fb._prob_params(params)
    sl = lambda a, off=0: jax.lax.dynamic_slice(a, (s + off,), (Kp,))
    xoff = sl(xoff_g) + base
    delta = sl(delta_g)
    d_km1 = sl(delta_g, -1)
    d1 = sl(delta_g, 1)
    d2 = sl(delta_g, 2)
    jlo = sl(jlo_g) - base
    jhi = sl(jhi_g) - base
    ks = s + jnp.arange(Kp, dtype=jnp.int32)
    if jax.default_backend() == "tpu":
        wx, wy = _fb._symbol_windows_slab(sx_pad, sy_pad, xoff, delta, LY,
                                          W, ks, pad_off, K_rows=Kp)
    else:
        wx, wy = _fb._symbol_windows_scan(sx_pad, sy_pad, xoff, delta, LY,
                                          W, ks=ks, pad_off=pad_off)
    e_x, e_y, e_m = _fb._emissions(prob, wx[:, :W], wy[:, 1:])
    ef_x, ef_y, ef_m = _fb._emissions(prob, wx[:, 1:], wy[:, :W])

    js = jnp.arange(W, dtype=jnp.int32)
    slot_ok = ((js[None, :] >= jlo[:, None])
               & (js[None, :] <= jhi[:, None]))
    fm = slot_ok.astype(jnp.float32)

    dmid = delta + d_km1 - 1
    dsum2 = d1 + d2
    dmid1 = d1 + delta - 1
    i8 = lambda cond: jnp.broadcast_to(
        cond[:, None], (Kp, W)).astype(jnp.int8)

    xs = xoff[:, None] + js[None, :]
    ys = ks[:, None] - xs
    emit = ((ks >= k0) & (ks < k0 + K) & (ks >= 1) & (ks <= L))[:, None]
    pm = (jnp.where(emit & slot_ok & (xs > 0) & (ys > 0), _wf._PM_MATCH, 0)
          | jnp.where(emit & slot_ok & (xs > 0), _wf._PM_GAPX, 0)
          | jnp.where(emit & slot_ok & (ys > 0), _wf._PM_GAPY, 0)
          | jnp.where((ks == L)[:, None], _wf._PM_ATEND, 0)
          | jnp.where(((ks >= 1) & (ks < L))[:, None], _wf._PM_BRIDGE, 0))

    return dict(
        ex=e_x * fm, ey=e_y * fm, em=e_m * fm,
        efx=ef_x * fm, efy=ef_y * fm, efm=ef_m * fm,
        a=i8(delta == 1), b1=i8(dmid == 1), b0=i8(dmid == 0),
        abw=i8(d1 == 1), c1=i8(dsum2 == 2), c0=i8(dsum2 == 1),
        bm1=i8(dmid1 == 1), bm0=i8(dmid1 == 0), pm=pm.astype(jnp.int8))


@functools.partial(
    jax.jit,
    static_argnames=("S", "nz", "K", "Kp", "W", "chunk", "group", "mode",
                     "interpret", "pad_off"))
def _par_slice_jit(params, sx_pad, sy_pad, xoff_g, delta_g, jlo_g, jhi_g,
                   s_arr, k0_arr, base_arr, LY, L, ragged_left,
                   ragged_right, thr,
                   S, nz, K, Kp, W, chunk, group, mode, interpret,
                   pad_off):
    """One slice of windows through the wavefront kernels, grouped on the
    sublane dimension. Returns, per key, the dense window-major posterior
    rows (left on device) plus the >= thr entry count and per-row max for
    tight-capacity compaction by the caller."""
    nWs = s_arr.shape[0]
    G = group
    NG = nWs // G
    NC = Kp // chunk
    prob = _fb._prob_params(params)
    t_prob = jnp.exp(params["t"]).reshape(3 * S, S)

    pre = jax.vmap(
        lambda s, k0, base: _prep_one(params, sx_pad, sy_pad, xoff_g,
                                      delta_g, jlo_g, jhi_g, s, k0, base,
                                      K, LY, L, Kp, W, pad_off=pad_off)
    )(s_arr, k0_arr, base_arr)

    # per-window carries: exact start for the window at row 1, neutral
    # uniform in-band two rows before the range otherwise
    start_vec = jnp.where(ragged_left, prob["ragged_start"], prob["start"])
    F0 = jnp.zeros((S, W), jnp.float32).at[:, 0].set(start_vec)
    F0 = F0 / jnp.maximum(jnp.max(F0), 1e-30)

    def fwd_carry(s, base):
        exact = s == 1
        i2 = jnp.maximum(s - 2, 0)
        n1 = _neutral_row(jlo_g[s - 1] - base, jhi_g[s - 1] - base, S, W)
        n2 = _neutral_row(jlo_g[i2] - base, jhi_g[i2] - base, S, W)
        f1 = jnp.where(exact, F0, n1)
        f2 = jnp.where(exact, jnp.zeros_like(F0), n2)
        return f1, f2, jnp.ones((1,), jnp.float32)

    f1, f2, invm = jax.vmap(fwd_carry)(s_arr, base_arr)

    def bwd_carry(s, base):
        top = s + Kp  # first row ABOVE the range
        natural = top > L  # range reaches past L: exact end seeding
        b1 = jnp.where(natural, 0.0, 1.0) * _neutral_row(
            jlo_g[jnp.minimum(top, jlo_g.shape[0] - 1)] - base,
            jhi_g[jnp.minimum(top, jhi_g.shape[0] - 1)] - base, S, W)
        b2 = jnp.where(natural, 0.0, 1.0) * _neutral_row(
            jlo_g[jnp.minimum(top + 1, jlo_g.shape[0] - 1)] - base,
            jhi_g[jnp.minimum(top + 1, jhi_g.shape[0] - 1)] - base, S, W)
        return b1, b2, jnp.ones((1,), jnp.float32)

    b1c, b2c, invb = jax.vmap(bwd_carry)(s_arr, base_arr)

    end_vec = jnp.where(ragged_right, prob["ragged_end"], prob["end"])
    jsW = jnp.arange(W, dtype=jnp.int32)

    def end_row_one(base):
        sokL = ((jsW >= jlo_g[L] - base)
                & (jsW <= jhi_g[L] - base)).astype(jnp.float32)
        return end_vec[:, None] * sokL[None, :]

    end_row = jax.vmap(end_row_one)(base_arr)

    def grp_row(arr):  # (nWs, Kp, [W]) -> (NG, Kp, G, [W])
        return jnp.transpose(
            arr.reshape((NG, G) + arr.shape[1:]),
            (0, 2, 1) + tuple(range(3, arr.ndim + 1)))

    def grp_state(arr):  # (nWs, S, W) -> (NG, S, G, W)
        return jnp.transpose(arr.reshape(NG, G, S, W), (0, 2, 1, 3))

    vmem = pltpu.VMEM
    row_spec = lambda last: pl.BlockSpec(
        (1, chunk, G) + last, lambda g, c: (g, c, 0) + (0,) * len(last),
        memory_space=vmem)
    state_spec = pl.BlockSpec((1, S, G, W), lambda g, c: (g, 0, 0, 0),
                              memory_space=vmem)
    col_spec = pl.BlockSpec((1, G, 1), lambda g, c: (g, 0, 0),
                            memory_space=vmem)

    fwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NG, NC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [row_spec((W,))] * 6 + [state_spec, state_spec, col_spec],
        out_specs=[
            pl.BlockSpec((1, chunk, S, G, W),
                         lambda g, c: (g, c, 0, 0, 0), memory_space=vmem),
            row_spec((W,)), row_spec((1,)),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, G, W), jnp.float32),
            pltpu.VMEM((S, G, W), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
        ],
    )

    def fwd_wrapper(*refs):
        ins = refs[:10]
        outs = refs[10:13]
        scr = refs[13:]
        _wf._fwd_kernel(*ins, *outs, None, None, None, *scr,
                        S=S, nz=nz, chunk=chunk, fresh=False, phase=1)

    F_all, bv, _mf = pl.pallas_call(
        fwd_wrapper,
        grid_spec=fwd_grid,
        out_shape=[
            jax.ShapeDtypeStruct((NG, Kp, S, G, W), jnp.float32),
            jax.ShapeDtypeStruct((NG, Kp, G, W), jnp.float32),
            jax.ShapeDtypeStruct((NG, Kp, G, 1), jnp.float32),
        ],
        interpret=interpret,
    )(t_prob, grp_row(pre["ex"]), grp_row(pre["ey"]), grp_row(pre["em"]),
      grp_row(pre["a"]), grp_row(pre["b1"]), grp_row(pre["b0"]),
      grp_state(f1), grp_state(f2), invm.reshape(NG, G, 1))

    n_out = 3 if mode == "posterior_all" else 1
    rrow = lambda last: pl.BlockSpec(
        (1, chunk, G) + last,
        lambda g, c: (g, NC - 1 - c, 0) + (0,) * len(last),
        memory_space=vmem)
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NG, NC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [rrow((W,))] * 4
        + [pl.BlockSpec((1, chunk, S, G, W),
                        lambda g, c: (g, NC - 1 - c, 0, 0, 0),
                        memory_space=vmem)]
        + [rrow((W,))] * 7
        + [state_spec]  # end rows
        + [state_spec, state_spec, col_spec,
           pl.BlockSpec((1, G, W), lambda g, c: (g, 0, 0),
                        memory_space=vmem),
           pl.BlockSpec((1, G, W), lambda g, c: (g, 0, 0),
                        memory_space=vmem)],
        out_specs=[rrow((W,))] * n_out + [rrow((1,))] * 2,
        scratch_shapes=[
            pltpu.VMEM((S, G, W), jnp.float32),
            pltpu.VMEM((S, G, W), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, W), jnp.float32),
            pltpu.VMEM((G, W), jnp.float32),
        ],
    )

    def bwd_wrapper(*refs):
        ins = refs[:14]
        bci = refs[14:19]
        posts_ = refs[19:19 + n_out]
        mbr, totr = refs[19 + n_out:21 + n_out]
        scr = refs[21 + n_out:]
        if n_out == 1:
            posts_ = (posts_[0], None, None)
        _wf._bwd_kernel(*ins, tuple(bci), *posts_, mbr, totr, None, phase=1,
                        *scr, S=S, nz=nz, chunk=chunk, mode=mode)

    outs = pl.pallas_call(
        bwd_wrapper,
        grid_spec=bwd_grid,
        out_shape=[jax.ShapeDtypeStruct((NG, Kp, G, W), jnp.float32)] * n_out
        + [jax.ShapeDtypeStruct((NG, Kp, G, 1), jnp.float32)] * 2,
        interpret=interpret,
    )(t_prob, grp_row(pre["efx"]), grp_row(pre["efy"]), grp_row(pre["efm"]),
      grp_row(pre["em"]), F_all, bv,
      grp_row(pre["abw"]), grp_row(pre["c1"]), grp_row(pre["c0"]),
      grp_row(pre["bm1"]), grp_row(pre["bm0"]), grp_row(pre["pm"]),
      grp_state(end_row),
      grp_state(b1c), grp_state(b2c), invb.reshape(NG, G, 1),
      jnp.zeros((NG, G, W), jnp.float32),
      jnp.zeros((NG, G, W), jnp.float32))

    out = {}
    keys = (("post_match", "post_gap_x", "post_gap_y")[:n_out])
    for k, arr in zip(keys, outs[:n_out]):
        # (NG, Kp, G, W) -> (nWs, Kp, W) window-major; entries stay on
        # device — the host fetches counts first, then compacts at tight
        # capacity (the link is bandwidth-bound at ~50 MB/s, so fetched
        # bytes, not round trips, dominate; see fb_pass_parallel)
        win = jnp.transpose(arr, (0, 2, 1, 3)).reshape(nWs * Kp, W)
        hit = win >= thr
        rows = jnp.sum(hit, axis=-1)
        out[k] = (win, jnp.sum(rows, dtype=jnp.int32),
                  jnp.max(rows).astype(jnp.int32))
    return out


@functools.partial(jax.jit, static_argnames=("cap", "exact"))
def _compact_win_jit(win, thr, cap, exact=False):
    if exact:
        idx, vals, count = compact.compact_rows_exact(win, thr, cap)
        return idx, vals
    idx, vals, _count, _row_max = compact.compact_rows(win, thr, cap)
    return idx, vals


def fb_pass_parallel(params, seq_x_codes, seq_y_codes,
                     offsets: np.ndarray, widths: np.ndarray,
                     lx: int, ly: int, ragged_left: bool,
                     ragged_right: bool, mode: str, width: int,
                     burnin: int, threshold: float,
                     window: int = 0, interpret: bool | None = None):
    """Burn-in-parallel banded posterior decode for ONE long pair.

    Args as fb_streaming.fb_pass_streaming; `burnin` is the halo length
    (burnin_rows(p)). Returns {"post_entries": {key: (vals, ks, js)},
    "xoff", "windows"} — no global scale streams (see module doc).
    """
    if not supported(mode):
        raise ValueError(f"parallel engine does not support mode={mode!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nz = _wf.nonzero_transitions_of(params["t"])
    S = int(params["start"].shape[0])
    W = int(width)
    K = int(window) if window else WINDOW_ROWS
    L = int(lx) + int(ly)
    if L == 0:
        raise ValueError("empty pair")
    B = -(-max(int(burnin), 8) // 8) * 8
    K = max(K, B)

    nW = -(-L // K)
    rows_total = 1 + nW * K
    KpMAX = K + 2 * B + _wf.CHUNK  # upper bound on any bucket's Kp

    xoff, delta, jlo, jhi = _host_frame(np.asarray(offsets),
                                        np.asarray(widths))
    xoff, delta, jlo, jhi = _pad_frame(xoff, delta, jlo, jhi,
                                       rows_total + KpMAX)

    sx = np.asarray(seq_x_codes, np.int8)
    sy = np.asarray(seq_y_codes, np.int8)
    pad_off = KpMAX + W + 1
    pad = np.full(pad_off, _fb._SENTINEL, np.int8)
    sx_pad = jnp.asarray(np.concatenate([pad, sx, pad]))
    sy_pad = jnp.asarray(np.concatenate([pad, sy[::-1], pad]))
    LY = int(ly)

    dev = jnp.asarray
    xoff_d, delta_d = dev(xoff), dev(delta)
    jlo_d, jhi_d = dev(jlo), dev(jhi)

    k0s = 1 + K * np.arange(nW, dtype=np.int32)
    ss = np.maximum(k0s - B, 1).astype(np.int32)

    # Per-window frame rebasing: the global frame is as wide as the
    # band's WIDEST row (a single wide anchor gap pays on every diagonal
    # of the pair — measured 9x lane waste on evolved 50 kb pairs), but a
    # window only spans its own rows' slots. Rebase each window to
    # [base, base + local_width) and bucket windows by lane-tile width so
    # narrow-band stretches run on narrow tiles. Window 0 keeps base=0
    # (its exact start carry F0 addresses global slot 0).
    bases = np.zeros(nW, np.int32)
    locw = np.empty(nW, np.int32)
    for w in range(nW):
        s = int(ss[w])
        # span includes rows s-2..s-1: fwd_carry seeds from them, and a
        # band shifting left going up could otherwise push part of the
        # halo seed below the local frame edge (silently zeroing it)
        s_lo = max(s - 2, 0)
        lo_w = int(jlo[s_lo:s + KpMAX].min()) if w > 0 else 0
        hi_w = int(jhi[s_lo:s + KpMAX].max())
        bases[w] = max(lo_w, 0)
        locw[w] = max(hi_w - bases[w] + 1, 1)

    def _lane_bucket(wl: int) -> int:
        # Power-of-two width buckets (vs multiples of 128): a repeat-rich
        # long pair produces windows of wildly varying local width, and
        # every distinct bucket is a separate remote-compiled executable
        # (~30-60 s each on the tunneled backend — a killed 500 kb bench
        # run left 79 _par_slice_jit entries in the persistent cache).
        # log2 bucketing caps that at ~5 shapes per mode for <=2x lane
        # padding on the rare wide stretches.
        if W <= 128:
            return W
        b = 128
        while b < int(wl):
            b *= 2
        return min(b, W)

    buckets: dict = {}
    for w in range(nW):
        buckets.setdefault(_lane_bucket(locw[w]), []).append(w)

    thr = max(float(threshold), 1e-9)
    n_out = 3 if mode == "posterior_all" else 1
    keys = (("post_match", "post_gap_x", "post_gap_y")[:n_out])

    # Count-first host-link discipline (the link is bandwidth-bound at
    # ~50 MB/s with ~13-23 ms latency): enqueue slices, fetch only the
    # tiny entry counts, then compact each slice at the tight
    # power-of-two capacity so the big fetch carries just the
    # thresholded entries.  Dense window posteriors are dropped at each
    # flush so peak HBM stays O(_F_BUDGET), not O(full band area): count
    # fetches batch per flush group (one extra round trip per ~1 GiB of
    # dense band) instead of per slice or all-at-the-end.
    results = []  # flushed: (ss_sl, base_sl, Kp, Wb, per-key compacted)
    pending = []  # launched, dense resident: (ss, base, Kp, Wb, r, bytes)
    pending_bytes = 0

    def _flush_pending():
        nonlocal pending_bytes
        if not pending:
            return
        counts = hostlink.device_get_pipelined(
            [[(r[k][1], r[k][2]) for k in keys]
             for (_s, _b, _kp, _wb, r, _n) in pending])
        for ((ss_sl, base_sl, Kp, Wb, r, _n), cnt) in zip(pending, counts):
            per = []
            for k, (count, row_max) in zip(keys, cnt):
                # coarse capacity ladder (4^n from 4096): every distinct
                # cap is a separately compiled compaction executable on
                # the remote backend; the fine pow2 ladder left 40 cached
                # variants after one long-pair run
                cap = 4096
                while cap < int(count):
                    cap *= 4
                exact = int(row_max) > compact.DEFAULT_SLOTS
                per.append(_compact_win_jit(r[k][0], jnp.float32(thr),
                                            cap=cap, exact=exact))
            results.append((ss_sl, base_sl, Kp, Wb, per))
        pending.clear()  # drops the dense arrays
        pending_bytes = 0

    for Wb in sorted(buckets):
        wins = buckets[Wb]
        nWb = len(wins)
        # Pin (group, chunk) per lane bucket instead of pick_tiles'
        # batch-scored choice: the score varies with every chunk's window
        # count, and each distinct (group, chunk) is another 30-60 s
        # remote-compiled executable. Two group tiers keep the
        # _GROUP_SPEED win for many-window pairs at bounded shape count.
        group = 64 if nWb >= 64 else 8
        We_b = max(Wb, 128)
        env_b = _wf._envelope(We_b)
        while group > 8 and group * 8 * We_b > env_b:
            group //= 2
        q = 8 if mode == "expectation" else _wf.NORM_EVERY
        chunk = max(q, min(_wf.CHUNK, (env_b // (group * We_b)) // q * q))
        Kp = -(-(K + 2 * B) // chunk) * chunk
        nWbp = -(-nWb // group) * group
        ss_b = np.full(nWbp, rows_total, np.int32)
        k0_b = np.full(nWbp, rows_total, np.int32)
        base_b = np.zeros(nWbp, np.int32)
        ss_b[:nWb] = ss[wins]
        k0_b[:nWb] = k0s[wins]
        base_b[:nWb] = bases[wins]
        per_win = Kp * S * Wb * 4
        wmax = max(group, (_F_BUDGET // per_win) // group * group)
        # pow2 slice ladder: a varying last-slice length would otherwise
        # compile one executable per distinct window count
        w2 = group
        while w2 * 2 <= wmax:
            w2 *= 2
        wmax = w2
        shrunk = False
        for lo in range(0, nWbp, wmax):
            hi = min(lo + wmax, nWbp)
            n_sl = hi - lo
            ns = group
            while ns < n_sl:
                ns *= 2
            if ns > n_sl:
                # pad the slice to its pow2 size with inactive windows
                # (ss/k0 = rows_total: empty band rows, no-op like the
                # nWbp group padding above)
                pad_n = ns - n_sl
                ss_b = np.concatenate(
                    [ss_b[:hi], np.full(pad_n, rows_total, np.int32),
                     ss_b[hi:]])
                k0_b = np.concatenate(
                    [k0_b[:hi], np.full(pad_n, rows_total, np.int32),
                     k0_b[hi:]])
                base_b = np.concatenate(
                    [base_b[:hi], np.zeros(pad_n, np.int32), base_b[hi:]])
                hi = lo + ns
                nWbp += pad_n
            while True:
                try:
                    r = _par_slice_jit(
                        params, sx_pad, sy_pad, xoff_d, delta_d, jlo_d,
                        jhi_d,
                        jnp.asarray(ss_b[lo:hi]), jnp.asarray(k0_b[lo:hi]),
                        jnp.asarray(base_b[lo:hi]),
                        jnp.int32(LY), jnp.int32(L), bool(ragged_left),
                        bool(ragged_right), jnp.float32(thr),
                        S=S, nz=nz, K=K, Kp=Kp, W=Wb, chunk=chunk,
                        group=group, mode=mode, interpret=interpret,
                        pad_off=pad_off)
                    if shrunk:
                        _wf.confirm_tiles(group, chunk, Wb)
                    break
                except Exception as e:  # VMEM compile OOM: self-heal
                    # posterior kernels accept chunk down to NORM_EVERY;
                    # ultra-wide windows (thousands of lanes) need it
                    smaller = (_wf.shrink_tiles(group, chunk, Wb,
                                                _wf.NORM_EVERY)
                               if _wf._is_vmem_oom(e) else None)
                    if smaller is None:
                        raise
                    group, chunk = smaller
                    Kp = -(-(K + 2 * B) // chunk) * chunk
                    shrunk = True
            n_dense = n_out * (hi - lo) * Kp * Wb * 4
            pending.append((ss_b[lo:hi], base_b[lo:hi], Kp, Wb, r, n_dense))
            pending_bytes += n_dense
            if pending_bytes >= _F_BUDGET:
                _flush_pending()

    _flush_pending()
    fetched = hostlink.device_get_pipelined(
        [per for (_s, _b, _kp, _wb, per) in results])

    entries = {k: ([], [], []) for k in keys}
    for (ss_sl, base_sl, Kp, Wb, _per), per in zip(results, fetched):
        for k, (idx, vals) in zip(keys, per):
            sel = idx >= 0
            idx, vals = idx[sel].astype(np.int64), vals[sel]
            win = idx // (Kp * Wb)
            rem = idx % (Kp * Wb)
            ks_loc = rem // Wb
            js = (rem % Wb).astype(np.int64) + base_sl[win]
            ks = ss_sl[win] + ks_loc
            entries[k][0].append(vals)
            entries[k][1].append(ks)
            entries[k][2].append(js)

    return {
        "windows": nW,
        "xoff": xoff,
        "post_entries": {
            k: tuple(np.concatenate(parts) if parts else np.zeros(0)
                     for parts in entries[k])
            for k in keys},
    }
