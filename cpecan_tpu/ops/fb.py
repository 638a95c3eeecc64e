"""Banded pair-HMM forward-backward on anti-diagonal wavefronts (lax.scan).

TPU-native re-design of the reference banded FB engine
(impl/pairwiseAligner.c:756-949). Differences by design:

 * The reference walks diagonals serially per-cell with a callback per
   transition; here each diagonal is a dense (S, W) log-space tensor and the
   whole cell update is three masked-shift + logsumexp contractions (one per
   neighbor class), vectorized across the band width.

 * The reference bounds memory with traceback windows and re-estimates the
   total probability every 10 diagonals (:830-838). Here every diagonal is
   normalized against its OWN exact total probability (forward.backward dot
   plus the match "bridge" correction, the semantics of
   diagonalCalculationTotalProbability :636-653), so posteriors are
   self-normalized per diagonal and immune to log-scale drift. Memory is
   bounded by jax.checkpoint-style chunked recompute (see fb_chunked).

 * Doubles + approximate logAdd lookup (:287-307) become fp32 + exact
   logaddexp with per-diagonal max-rescaling: every stored diagonal is
   shifted so its max is 0; the shifts (mf/mb) are emitted per-diagonal and
   recombined in float64 on the host for global log-likelihoods.

Cell/neighbor geometry (reference :609-624): cell (xay=k, xmy) has
  lower  = (k-1, xmy-1)  consuming X  (gap-X transitions)
  middle = (k-2, xmy)    consuming XY (match transitions)
  upper  = (k-1, xmy+1)  consuming Y  (gap-Y transitions)
A diagonal's cells live at slots j with xmy = offset[k] + 2*j, j < width[k].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -jnp.inf

# Symbol code for N — index 4 of the padded emission tables.
_N = 4

# State-machine param pytree keys (see StateMachine.device_params):
#   t: (3, S, S) stacked [t_x, t_m, t_y]; em_match (5,5); em_gap_x/y (5,)
#   start / ragged_start / end / ragged_end: (S,)


def _shift_slots(arr: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """out[..., j] = arr[..., j + d], padding with -inf out of range."""
    W = arr.shape[-1]
    padded = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(W, W)], constant_values=NEG_INF)
    d = jnp.clip(d, -W, W)
    start = (0,) * (arr.ndim - 1) + (W + d,)
    return jax.lax.dynamic_slice(padded, start, arr.shape)


def _lse(a, axis):
    return jax.nn.logsumexp(a, axis=axis)


def _diag_coords(k, o_k, W):
    """x,y coordinates of the W slots of diagonal k."""
    j = jnp.arange(W, dtype=jnp.int32)
    x0 = (k + o_k) // 2
    y0 = (k - o_k) // 2
    return x0 + j, y0 - j


def _cell_symbols(sx, sy, xs, ys, lx, ly):
    """Symbols at cells (xs, ys): index i reads sequence position i-1;
    out-of-range coordinates read as N (reference getX/YCharacter :597-607)."""
    symx = jnp.where(
        (xs >= 1) & (xs <= lx), sx[jnp.clip(xs - 1, 0, sx.shape[0] - 1)], _N
    )
    symy = jnp.where(
        (ys >= 1) & (ys <= ly), sy[jnp.clip(ys - 1, 0, sy.shape[0] - 1)], _N
    )
    return symx, symy


def _forward_step(params, sx, sy, lx, ly, carry, inputs):
    """One forward wavefront step: compute diagonal k from k-1, k-2."""
    F1, F2, o1, o2, m1 = carry
    k, o_k, w_k = inputs
    W = F1.shape[-1]
    t_x, t_m, t_y = params["t"][0], params["t"][1], params["t"][2]

    d1 = (o_k - 1 - o1) // 2
    d2 = (o_k - o2) // 2
    lower = _shift_slots(F1, d1)
    upper = _shift_slots(F1, d1 + 1)
    middle = _shift_slots(F2, d2) - m1  # bring F2 into F1's scale frame

    xs, ys = _diag_coords(k, o_k, W)
    symx, symy = _cell_symbols(sx, sy, xs, ys, lx, ly)
    e_x = params["em_gap_x"][symx]  # (W,)
    e_y = params["em_gap_y"][symy]
    e_m = params["em_match"][symx, symy]

    # cur[to, j] = logsumexp_from(neighbor[from, j] + t_c[from, to]) + e_c[j]
    cx = _lse(lower[:, None, :] + t_x[:, :, None], axis=0) + e_x[None, :]
    cm = _lse(middle[:, None, :] + t_m[:, :, None], axis=0) + e_m[None, :]
    cy = _lse(upper[:, None, :] + t_y[:, :, None], axis=0) + e_y[None, :]
    cur = jnp.logaddexp(jnp.logaddexp(cx, cy), cm)

    slot_ok = jnp.arange(W, dtype=jnp.int32) < w_k
    cur = jnp.where(slot_ok[None, :], cur, NEG_INF)

    m = jnp.max(cur)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    F_new = cur - m
    new_carry = (F_new, F1, o_k, o1, m)
    return new_carry, (F_new, m)


def forward_sweep(params, sx, sy, offsets, widths, lx, ly, ragged_left, width):
    """Run the forward recursion over all (padded) diagonals.

    Returns (F_all [P+1,S,W] shifted log-forward values, mf [P+1] shifts).
    True F_k = F_all[k] + sum(mf[:k+1]).
    """
    S = params["start"].shape[0]
    P = offsets.shape[0] - 1
    W_static = width

    start_vec = jnp.where(ragged_left, params["ragged_start"], params["start"])
    F0 = jnp.full((S, W_static), NEG_INF, dtype=jnp.float32)
    F0 = F0.at[:, 0].set(start_vec)  # diagonal 0 is the single cell (0,0)

    ks = jnp.arange(1, P + 1, dtype=jnp.int32)
    step = functools.partial(_forward_step, params, sx, sy, lx, ly)
    init = (F0, jnp.full((S, W_static), NEG_INF, jnp.float32),
            offsets[0], offsets[0] - 1, jnp.float32(0.0))
    _, (F_rest, mf_rest) = jax.lax.scan(step, init, (ks, offsets[1:], widths[1:]))

    F_all = jnp.concatenate([F0[None], F_rest], axis=0)
    mf = jnp.concatenate([jnp.zeros((1,), jnp.float32), mf_rest])
    return F_all, mf


def _backward_value_step(params, sx, sy, lx, ly, L, end_vec, carry, inputs):
    """Compute shifted B_k from B_{k+1}, B_{k+2} (with the k==L init
    override), returning also the shift mb_k."""
    B1, B2, mb1 = carry
    k, o_k, o_k1, o_k2, w_k = inputs
    W = B1.shape[-1]
    S = B1.shape[0]
    t_x, t_m, t_y = params["t"][0], params["t"][1], params["t"][2]

    xs, ys = _diag_coords(k, o_k, W)
    # Future-cell emissions: x-class consumes x+1 (symbol index x), m-class
    # consumes (x+1, y+1), y-class consumes y+1 (symbol index y).
    symx_f, symy_f = _cell_symbols(sx, sy, xs + 1, ys + 1, lx, ly)
    e_x = params["em_gap_x"][symx_f]
    e_y = params["em_gap_y"][symy_f]
    e_m = params["em_match"][symx_f, symy_f]

    u1 = (o_k + 1 - o_k1) // 2
    u2 = (o_k - o_k2) // 2
    bx = _shift_slots(B1, u1)  # B_{k+1} slots receiving our x-transitions
    by = _shift_slots(B1, u1 - 1)
    bm = _shift_slots(B2, u2) - mb1  # frame adjust k+2 -> k+1

    # raw[from, j] = logsumexp_to(t_c[from,to] + B_next[to, j]) + e_c[j]
    cx = _lse(t_x[:, :, None] + bx[None, :, :], axis=1) + e_x[None, :]
    cm = _lse(t_m[:, :, None] + bm[None, :, :], axis=1) + e_m[None, :]
    cy = _lse(t_y[:, :, None] + by[None, :, :], axis=1) + e_y[None, :]
    raw = jnp.logaddexp(jnp.logaddexp(cx, cy), cm)

    slot_ok = jnp.arange(W, dtype=jnp.int32) < w_k
    raw = jnp.where(slot_ok[None, :], raw, NEG_INF)

    at_end = k == L
    init_row = jnp.where(slot_ok[None, :], end_vec[:, None], NEG_INF)
    raw = jnp.where(at_end, init_row, raw)

    m = jnp.max(raw)
    m = jnp.where(jnp.isfinite(m) & ~at_end, m, 0.0)
    B_new = raw - m

    B1_next = B_new
    B2_next = jnp.where(at_end, jnp.full_like(B1, NEG_INF), B1)
    mb1_next = jnp.where(at_end, 0.0, m)
    return (B1_next, B2_next, mb1_next), B_new, m, B1


def _bridge(params, sx, sy, lx, ly, F_km1, B_kp1, k, o_km1, o_kp1, w_kp1):
    """Match-bridge total-probability correction: probability mass of paths
    crossing diagonal k via a single match transition from k-1 to k+1
    (reference diagonalCalculationTotalProbability :643-651). Returned in
    the mixed frame cf_{k-1}+cb_{k+1}."""
    W = F_km1.shape[-1]
    t_m = params["t"][1]
    dm = (o_kp1 - o_km1) // 2
    mid = _shift_slots(F_km1, dm)
    xs, ys = _diag_coords(k + 1, o_kp1, W)
    symx, symy = _cell_symbols(sx, sy, xs, ys, lx, ly)
    e_m = params["em_match"][symx, symy]
    M = _lse(mid[:, None, :] + t_m[:, :, None], axis=0) + e_m[None, :]
    slot_ok = jnp.arange(W, dtype=jnp.int32) < w_kp1
    M = jnp.where(slot_ok[None, :], M, NEG_INF)
    return _lse(M + B_kp1, axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("mode", "width"))
def fb_pass(params, sx, sy, offsets, widths, lx, ly,
            ragged_left, ragged_right, mode: str = "posterior_match",
            width: int = 0):
    """Full banded forward-backward pass for one (padded) pair.

    Args:
      params: StateMachine.device_params() pytree.
      sx, sy: int32 padded symbol arrays.
      offsets, widths: int32 (P+1,) padded band tensors (pad_band).
      lx, ly: true sequence lengths (traced scalars). L = lx + ly.
      ragged_left/right: bool scalars selecting ragged start/end dists
        (reference getPosteriorProbsWithBanding args :756-758).
      mode: "posterior_match" | "posterior_all" | "expectation" | "forward".

    Returns a dict:
      always: "mf","mb" (P+1,) per-diagonal scale shifts; "log_fwd"
        raw end dot at L (true forward log-prob = log_fwd + sum mf, host f64);
      posterior modes: "post_match" (P+1, W) posterior probs (0 outside
        band/valid); posterior_all adds "post_gap_x","post_gap_y";
      expectation: "trans" (S,S), "emis" (S,4,4) expected counts, and
        "total_raw" (P+1,) per-diagonal raw totals for likelihood.
    """
    S = params["start"].shape[0]
    P = offsets.shape[0] - 1
    L = lx + ly

    F_all, mf = forward_sweep(params, sx, sy, offsets, widths, lx, ly,
                              ragged_left, width)
    W = F_all.shape[-1]

    end_vec = jnp.where(ragged_right, params["ragged_end"], params["end"])
    # Raw forward end-dot per diagonal; valid at k == L.
    fe = _lse(F_all + end_vec[None, :, None], axis=(1, 2))
    log_fwd = fe[jnp.clip(L, 0, P)]

    out = {"mf": mf, "log_fwd": log_fwd}
    if mode == "forward":
        out["mb"] = jnp.zeros_like(mf)
        return out

    # Padded arrays for k+1 / k+2 lookups.
    off_pad = jnp.concatenate([offsets, offsets[-1:] + 1, offsets[-1:]])
    w_pad = jnp.concatenate([widths, jnp.zeros((2,), widths.dtype)])
    mf_pad = jnp.concatenate([jnp.zeros((1,), mf.dtype), mf])  # mf_pad[k] = mf[k-1]

    ks = jnp.arange(P, -1, -1, dtype=jnp.int32)  # P .. 0

    def bwd_step(carry, k):
        o_k = off_pad[k]
        o_k1 = off_pad[k + 1]
        o_k2 = off_pad[k + 2]
        w_k = w_pad[k]
        (B1_prev, B2_prev, mb1) = carry[0]
        new_bcarry, B_k, mb_k, B_kp1 = _backward_value_step(
            params, sx, sy, lx, ly, L, end_vec,
            (B1_prev, B2_prev, mb1), (k, o_k, o_k1, o_k2, w_k))

        F_k = jax.lax.dynamic_slice(F_all, (k, 0, 0), (1, S, W))[0]
        km1 = jnp.maximum(k - 1, 0)
        F_km1 = jax.lax.dynamic_slice(F_all, (km1, 0, 0), (1, S, W))[0]
        F_km1 = jnp.where(k >= 1, F_km1, NEG_INF)
        mf_k = mf[jnp.clip(k, 0, P)]

        dot_raw = _lse(F_k + B_k, axis=(0, 1))
        bridge_raw = _bridge(params, sx, sy, lx, ly, F_km1, B_kp1,
                             k, off_pad[km1], o_k1, w_pad[k + 1])
        bridge_raw = jnp.where((k >= 1) & (k < L), bridge_raw, NEG_INF)
        total_raw = jnp.logaddexp(dot_raw, bridge_raw - mf_k - mb_k)

        valid_k = (k >= 1) & (k <= L)
        xs, ys = _diag_coords(k, o_k, W)
        slot_ok = jnp.arange(W, dtype=jnp.int32) < w_k

        emit = {"total_raw": total_raw, "mb": mb_k}
        if mode in ("posterior_match", "posterior_all"):
            def posterior(state, coord_ok):
                p = jnp.exp(F_k[state] + B_k[state] - total_raw)
                return jnp.where(valid_k & slot_ok & coord_ok, p, 0.0)

            emit["post_match"] = posterior(0, (xs > 0) & (ys > 0))
            if mode == "posterior_all":
                emit["post_gap_x"] = posterior(1, xs > 0)
                emit["post_gap_y"] = posterior(2, ys > 0)

        acc = carry[1]
        if mode == "expectation":
            km2 = jnp.maximum(k - 2, 0)
            F_km2 = jax.lax.dynamic_slice(F_all, (km2, 0, 0), (1, S, W))[0]
            F_km2 = jnp.where(k >= 2, F_km2, NEG_INF)
            mf_km1 = mf_pad[jnp.clip(k, 0, P)]  # mf[k-1]
            acc = _accumulate_expectations(
                params, sx, sy, lx, ly, acc,
                F_km1, F_km2, B_k, total_raw, mf_k, mf_km1,
                k, o_k, off_pad[km1], off_pad[km2], slot_ok, valid_k, xs, ys)

        return (new_bcarry, acc), emit

    B_init = (jnp.full((S, W), NEG_INF, jnp.float32),
              jnp.full((S, W), NEG_INF, jnp.float32), jnp.float32(0.0))
    if mode == "expectation":
        acc0 = (jnp.zeros((S, S), jnp.float32), jnp.zeros((S, 4, 4), jnp.float32))
    else:
        acc0 = ()
    (_, acc), emits = jax.lax.scan(bwd_step, (B_init, acc0), ks)

    # Emitted in k = P..0 order; flip to 0..P.
    for key, val in emits.items():
        out[key] = jnp.flip(val, axis=0)
    if mode == "expectation":
        out["trans"], out["emis"] = acc
    return out


def _accumulate_expectations(params, sx, sy, lx, ly, acc,
                             F_km1, F_km2, B_k, total_raw, mf_k, mf_km1,
                             k, o_k, o_km1, o_km2, slot_ok, valid_k, xs, ys):
    """Accumulate posterior transition/emission expected counts for diagonal
    k (semantics of diagonalCalculationExpectations / updateExpectations,
    reference impl/pairwiseAligner.c:735-746, :418-438):
      p = exp(F_prev[from] + B_k[to] + e + t - total); trans[from,to] += p;
      emis[to, symx, symy] += p when neither symbol is N.
    """
    trans_acc, emis_acc = acc
    S, W = B_k.shape
    t_x, t_m, t_y = params["t"][0], params["t"][1], params["t"][2]

    d1 = (o_k - 1 - o_km1) // 2
    d2 = (o_k - o_km2) // 2
    lower = _shift_slots(F_km1, d1) - mf_k
    upper = _shift_slots(F_km1, d1 + 1) - mf_k
    middle = _shift_slots(F_km2, d2) - mf_k - mf_km1

    symx, symy = _cell_symbols(sx, sy, xs, ys, lx, ly)
    e_x = params["em_gap_x"][symx]
    e_y = params["em_gap_y"][symy]
    e_m = params["em_match"][symx, symy]

    def class_post(neighbor, t_c, e_c):
        # (from, to, j) posterior probability tensor
        logp = (neighbor[:, None, :] + t_c[:, :, None]
                + B_k[None, :, :] + e_c[None, None, :] - total_raw)
        return jnp.exp(logp)

    p = (class_post(lower, t_x, e_x) + class_post(middle, t_m, e_m)
         + class_post(upper, t_y, e_y))
    p = jnp.where(valid_k & slot_ok[None, None, :], p, 0.0)

    trans_acc = trans_acc + jnp.sum(p, axis=2)

    q = jnp.sum(p, axis=0)  # (to, j): total posterior flow into `to`
    oh_x = (symx[:, None] == jnp.arange(4)[None, :]).astype(jnp.float32)
    oh_y = (symy[:, None] == jnp.arange(4)[None, :]).astype(jnp.float32)
    emis_acc = emis_acc + jnp.einsum("tj,ja,jb->tab", q, oh_x, oh_y)
    return trans_acc, emis_acc
