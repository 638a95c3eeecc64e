"""Fused Pallas banded-wavefront forward-backward kernels.

This is the speed-of-light engine for the banded pair-HMM FB pass
(reference hot loop: impl/pairwiseAligner.c:756-877, cell update
impl/stateMachine.c:450-480). The lax.scan engine in ops/fb.py executes
one tiny (S, W) update per sequential XLA loop step and materializes
whole (B, P, S, W) forward/backward tensors for the vectorized
reductions — dispatch-bound on the scan and HBM-bound on the
reductions. Here the whole wavefront runs inside two Pallas kernels:

 * **Forward kernel**: grid (pair-groups, diagonal-chunks); each program
   advances G pairs x CH diagonals with the scaled-probability carries
   (F_{k-1}, the pre-shifted U_{k-1}, 1/m_{k-1}) living in VMEM scratch
   that persists across the sequential grid steps. Emits the
   per-diagonal normalized forward probs F, log scales mf, and a
   pre-contracted "bridge vector" (see below).

 * **Backward+posterior kernel**: iterates the grid in reverse, carries
   (B_{k+1}, B_{k+2}, 1/mb_{k+1}), recomputes the per-diagonal total
   (forward.backward dot plus the one-step match-bridge correction of
   diagonalCalculationTotalProbability, reference :636-653) on the fly
   and writes only the posterior rows — no B tensor ever exists in HBM.

 * **Backward+expectation kernel** (_exp_kernel): the same backward
   recursion plus Baum-Welch expected-count accumulation in VMEM lane
   accumulators, reduced to (S, S) / (S, 4, 4) outputs per pair group —
   the EM E-step without materializing posteriors.

Tile parameters adapt to the workload: the diagonal chunk scales down
for wide bands (VMEM budget) and the pair group shrinks when the F
intermediate would exceed an HBM budget (long pairs).

Design notes (why it looks like this):
 - G pairs ride the sublane dimension and the W band slots the lane
   dimension, so every vector op is a full (8, 128) native tile.
 - All data-dependent neighbor shifts (amounts in {-1,0,1} from the
   band x-frame) are precomputed as int8 mask streams; in-kernel they
   become two-way lane-shift selects. Slot validity masks are folded
   into the emission streams (every contribution into a cell carries
   that cell's own emission factor, so masking emissions == masking the
   cell update).
 - The transition contraction is unrolled over the *statically nonzero*
   transitions of the state machine (13 for the 5-state, 9 for the
   3-state — the reference's 13-transition callback loop), read as
   scalars from SMEM.
 - The bridge correction needs F_{k-1} against B_{k+1}. The forward
   kernel emits bridgevec[k] = (sum_f F_{k-1}[f] * t_m[f, match]) / m_k,
   which the backward kernel shifts, dots with B_{k+1}[match] * em[k+1],
   and rescales by its own 1/mb_k — eliminating any backward-time access
   to mf or to non-current F rows.

Numerics are identical to ops/fb.py (same scaled-prob recurrence, same
per-diagonal max normalization), so the scan engine doubles as the
test oracle for this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpecan_tpu.ops import fb as _fb

# Default tile sizes: G pairs on sublanes, CH diagonals per grid step.
GROUP = 8
CHUNK = 64
# Apply the per-row max-rescale only every NORM_EVERY diagonals (the
# max+divide is ~25% of the row's vector work; fp32 absorbs the scale
# drift between normalizations).  Must divide the chunk sizes (8, 16,
# ...) and the segment/window bases mod-4 alignment; the scan engine
# follows the identical schedule so streams stay comparable.
NORM_EVERY = 4
# (the expectation kernel streams ~2x the inputs and uses chunk // 2)

# HBM budget for the F_all forward intermediate; batches whose F_all would
# exceed it are executed in group-aligned slices by the dispatcher.
_F_ALL_BUDGET = 3 << 30

# pm bitfield (int8 per (row, slot))
_PM_MATCH = 1  # posterior-match valid: 1<=k<=L & slot & x>0 & y>0
_PM_GAPX = 2
_PM_GAPY = 4
_PM_ATEND = 8  # k == L (broadcast over slots)
_PM_BRIDGE = 16  # 1 <= k < L (broadcast over slots)


def _shift_l(x):
    """out[..., j] = x[..., j+1], zero fill."""
    return jnp.concatenate([x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1)


def _shift_r(x):
    """out[..., j] = x[..., j-1], zero fill."""
    return jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)


# ---------------------------------------------------------------------------
# Lane packing: several pairs share one 128-lane vector row
# ---------------------------------------------------------------------------
#
# The default-expansion band is ~41 slots wide while the VPU lane tile is
# 128 wide, so an unpacked kernel wastes ~2/3 of every vector op on lane
# padding. Packing K = 128 // (W+1) pairs side by side in the lane
# dimension (each in a `seg = 128 // K`-lane segment, with at least one
# dead lane between neighbors because seg >= W+1) recovers that loss.
# The dead/pad lanes carry all-zero emission streams, so the DP values
# there stay exactly zero and the +-1 lane shifts of the wavefront
# recursion read the same zeros across a segment boundary that the
# unpacked kernel's zero-fill shifts produced — numerics are unchanged.
# Per-pair reductions become segment-local:
#  * max (normalization): masked shift-doubling suffix-max, then a 0/1
#    matmul broadcasts each segment's lane-0 value across the segment;
#  * sum (per-diagonal totals): one 0/1 block-diagonal matmul both sums
#    and broadcasts;
#  * per-pair scalar outputs (mf/mb/total): a (We, KE) selection matmul
#    picks each segment's first lane into a K-wide (padded to KE) lane
#    block, and its transpose re-expands per-pair scalars (adj streams).
# The matmuls run at HIGHEST precision so selection/sum stays f32-exact
# in the mantissa bits the parity tests measure.


def _seg_shift_l_by(x, s):
    return jnp.concatenate(
        [x[..., s:], jnp.zeros_like(x[..., :s])], axis=-1)


def _seg_make_consts(seg: int, We: int, KE: int):
    """Segment-reduction constants, built from iotas INSIDE the kernel
    (Pallas forbids captured host constants): the doubling-shift masks,
    the block-diagonal sum/broadcast matrix M, the segment-start row,
    and the pick/expand selection matrices."""
    f32 = jnp.float32
    j = jax.lax.broadcasted_iota(jnp.int32, (1, We), 1)
    ji = jax.lax.broadcasted_iota(jnp.int32, (We, We), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (We, We), 1)
    ei = jax.lax.broadcasted_iota(jnp.int32, (We, KE), 0)
    ek = jax.lax.broadcasted_iota(jnp.int32, (We, KE), 1)
    bk = jax.lax.broadcasted_iota(jnp.int32, (KE, We), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (KE, We), 1)
    masks = []
    s = 1
    while s < seg:
        masks.append(((j % seg) + s < seg).astype(f32))
        s *= 2
    return {
        "masks": masks,
        "start": (j % seg == 0).astype(f32),
        "M": (ji // seg == jj // seg).astype(f32),
        "E": (ei == ek * seg).astype(f32),
        "Ebc": (bj // seg == bk).astype(f32),
    }


def _seg_dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def _seg_max_bcast(v, seg, sc):
    """Per-segment max of a (G, We) tile, broadcast back across each
    segment's lanes. Requires v >= 0 (zero is the masked identity)."""
    s = 1
    for mask in sc["masks"]:
        v = jnp.maximum(v, _seg_shift_l_by(v, s) * mask)
        s *= 2
    return _seg_dot(v * sc["start"], sc["M"])


def _seg_sum_bcast(v, sc):
    """Per-segment sum of a (G, We) tile, broadcast across each segment."""
    return _seg_dot(v, sc["M"])


def _seg_pick(v, sc):
    """(G, We) -> (G, KE): lane k*seg (pair k's slot 0) into lane k."""
    return _seg_dot(v, sc["E"])


def _seg_expand(vk, sc):
    """(G, KE) per-pair scalars -> (G, We) segment-broadcast lanes."""
    return _seg_dot(vk, sc["Ebc"])


def nonzero_transitions(t_log: np.ndarray):
    """Static (class, from, to) triples of active transitions from the
    numpy/host copy of the (3, S, S) log transition tensor."""
    t = np.asarray(t_log)
    triples = []
    for c in range(3):
        for f in range(t.shape[1]):
            for to in range(t.shape[2]):
                if np.isfinite(t[c, f, to]):
                    triples.append((c, f, to))
    return tuple(triples)


# Device-transition-tensor -> triples cache: computing the triples costs a
# device->host fetch (~13-23 ms on the tunneled link), paid once per
# distinct tensor instead of once per engine launch. Weak references: a
# model churn (many short-lived StateMachines) can never pin device
# arrays alive through this module-global.
_NZ_CACHE: dict = {}


def nonzero_transitions_of(t_dev):
    """nonzero_transitions of a (possibly device-resident) transition
    tensor, cached by array identity (weakly referenced)."""
    import jax
    import weakref

    hit = _NZ_CACHE.get(id(t_dev))
    if hit is not None and hit[0]() is t_dev:
        return hit[1]
    nz = nonzero_transitions(jax.device_get(t_dev))
    if len(_NZ_CACHE) > 64:
        _NZ_CACHE.clear()
    try:
        _NZ_CACHE[id(t_dev)] = (weakref.ref(t_dev), nz)
    except TypeError:
        pass  # non-weakref-able array type: skip caching
    return nz


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(t_ref, ex_ref, ey_ref, em_ref, a_ref, b1_ref, b0_ref,
                f0_ref, ci2_ref, cim_ref, fout_ref, bv_ref, mf_ref,
                co1_ref, co2_ref, com_ref,
                f1_s, f2_s, invm_s, *, S, nz, chunk, fresh=True, phase=0,
                seg=None, KE=8):
    """Forward wavefront over one pair group.

    fresh=True (batch path / first segment): f0_ref is the diagonal-0
    start row F0; row 0 of the outputs is written directly from it and
    the recursion starts at row 1 (ci2/cim unused, pass None).
    fresh=False (interior segment, ops/fb_segmented.py): (f0, ci2, cim)
    are the carried (F_{k0-1}, F_{k0-2}, 1/m_{k0-1}) and every row is a
    computed diagonal. co1/co2/com (optional) receive the final carry on
    the group's last grid step so the next segment can continue exactly.

    Skip-normalization: the per-row max/rescale is only applied on
    diagonals with global index k % NORM_EVERY == NORM_EVERY-1 (mf = 0
    elsewhere) — the scaled-prob algebra is invariant to the schedule as
    long as mf records exactly what was applied, and fp32 absorbs the
    few rows of drift (growth <= 13x/row, shrink bounded by the smallest
    in-band emission*transition).  `phase` = (first row's global index)
    % NORM_EVERY: 0 for the batch path (row index == global diagonal),
    1 for segment/window launches (segments start at k0 === 1 mod 8).
    The scan engine (ops/fb.py) applies the identical schedule, so the
    engines' F/mf streams stay elementwise comparable.
    """
    c = pl.program_id(1)
    sc = (None if seg is None else
          _seg_make_consts(seg, ex_ref.shape[-1], KE))

    @pl.when(c == 0)
    def _():
        f1_s[...] = f0_ref[0]
        if fresh:
            f2_s[...] = jnp.zeros_like(f2_s)
            invm_s[...] = jnp.ones_like(invm_s)
            fout_ref[0, 0] = f0_ref[0]
            bv_ref[0, 0] = jnp.zeros_like(bv_ref[0, 0])
            mf_ref[0, 0] = jnp.zeros_like(mf_ref[0, 0])
        else:
            f2_s[...] = ci2_ref[0]
            invm_s[...] = cim_ref[0]

    xs_rows = sorted({f for cl, f, t in nz if cl == 0})
    ys_rows = sorted({f for cl, f, t in nz if cl == 2})
    mid_rows = sorted({f for cl, f, t in nz if cl == 1})
    match_tm = [(f, t) for cl, f, t in nz if cl == 1 and t == 0]

    def row_update(i, carry, do_norm):
        F1, F2, invm = carry
        ex = ex_ref[0, i]
        ey = ey_ref[0, i]
        em = em_ref[0, i]
        a = a_ref[0, i] != 0
        b1 = b1_ref[0, i] != 0
        b0 = b0_ref[0, i] != 0

        # lower neighbor (consumes X): shift d-1 in {-1,0}
        lx = {f: jnp.where(a, F1[f], _shift_r(F1[f])) * ex for f in xs_rows}
        # upper neighbor (consumes Y): shift d in {0,1}
        ly = {f: jnp.where(a, _shift_l(F1[f]), F1[f]) * ey for f in ys_rows}
        # middle neighbor (consumes XY): F_{k-2} shifted by the 3-way
        # dmid = d_k + d_{k-1} - 1 in {-1,0,1}. A single shift — composing
        # two opposite shifts would zero an edge slot that can be in-band.
        emi = em * invm
        lm = {f: jnp.where(b1, _shift_l(F2[f]),
                           jnp.where(b0, F2[f], _shift_r(F2[f]))) * emi
              for f in mid_rows}

        cur = [None] * S
        for cl, f, t in nz:
            term = (lx[f] if cl == 0 else lm[f] if cl == 1 else ly[f])
            term = term * t_ref[cl * S + f, t]
            cur[t] = term if cur[t] is None else cur[t] + term
        zero = jnp.zeros_like(ex)
        cur = [zero if c_ is None else c_ for c_ in cur]

        # bridgevec[r] = (sum_f F_{r-2}[f] * t_m[f, match]) / m_{r-1}: the
        # backward kernel dots this (shifted by dmid[r]) with
        # e_m[r] * B_r[match] and its own 1/mb to reproduce
        # bridge_at[k+1] * exp(-mf_k - mb_k) at k = r - 1.
        bv = zero
        for f, t in match_tm:
            bv = bv + F2[f] * t_ref[S + f, t]
        bv_ref[0, i] = bv * invm

        if do_norm:
            if seg is None:
                m = jnp.max(cur[0], axis=-1, keepdims=True)
                for t in range(1, S):
                    m = jnp.maximum(
                        m, jnp.max(cur[t], axis=-1, keepdims=True))
                m = jnp.where(m > 0, m, 1.0)
                mf_ref[0, i] = jnp.log(m)
            else:
                mv = cur[0]
                for t in range(1, S):
                    mv = jnp.maximum(mv, cur[t])
                m = _seg_max_bcast(mv, seg, sc)
                m = jnp.where(m > 0, m, 1.0)
                mp = _seg_pick(m, sc)
                # KE pad lanes (k >= K) pick 0: log-guard them to 0
                mf_ref[0, i] = jnp.log(jnp.where(mp > 0, mp, 1.0))
            r = 1.0 / m
            F_new = tuple(cur[t] * r for t in range(S))
            invm_new = jnp.broadcast_to(r, invm.shape)
        else:
            F_new = tuple(cur)
            mf_ref[0, i] = jnp.zeros_like(mf_ref[0, i])
            invm_new = jnp.ones_like(invm)
        for t in range(S):
            fout_ref[0, i, t] = F_new[t]
        return (F_new, tuple(F1), invm_new)

    def run_rows(base, carry, offset):
        # NORM_EVERY consecutive rows; static do_norm per unrolled slot
        for rr in range(offset, NORM_EVERY):
            carry = row_update(base + rr, carry,
                               do_norm=(phase + rr) % NORM_EVERY
                               == NORM_EVERY - 1)
        return carry

    # DP carries ride fori_loop registers; VMEM scratch only bridges the
    # sequential grid steps. Row 0 of chunk 0 is the precomputed F0; the
    # fresh path runs rows 1..NORM_EVERY-1 as a prologue (under the same
    # c == 0 predicate) so the unrolled loop stays row-aligned.
    init = (tuple(f1_s[f] for f in range(S)),
            tuple(f2_s[f] for f in range(S)), invm_s[...])

    if fresh:
        @pl.when(c == 0)
        def _():
            pro = run_rows(0, init, offset=1)
            for t in range(S):
                f1_s[t] = pro[0][t]
                f2_s[t] = pro[1][t]
            invm_s[...] = pro[2]

        init2 = (tuple(f1_s[f] for f in range(S)),
                 tuple(f2_s[f] for f in range(S)), invm_s[...])
        lo4 = jnp.where(c == 0, 1, 0)
    else:
        init2 = init
        lo4 = 0

    def body4(i4, carry):
        return run_rows(i4 * NORM_EVERY, carry, offset=0)

    F1c, F2c, invmc = jax.lax.fori_loop(lo4, chunk // NORM_EVERY, body4,
                                        init2)
    for t in range(S):
        f1_s[t] = F1c[t]
        f2_s[t] = F2c[t]
    invm_s[...] = invmc

    if co1_ref is not None:
        @pl.when(c == pl.num_programs(1) - 1)
        def _():
            for t in range(S):
                co1_ref[0, t] = F1c[t]
                co2_ref[0, t] = F2c[t]
            com_ref[0] = invmc


# ---------------------------------------------------------------------------
# Backward + posterior kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(t_ref, efx_ref, efy_ref, efm_ref, em_ref, f_ref, bv_ref,
                abw_ref, c1_ref, c0_ref, bm1_ref, bm0_ref, pm_ref, end_ref,
                bci_refs, post_m_ref, post_x_ref, post_y_ref,
                mb_ref, tot_ref, bco_refs,
                b1_s, b2_s, invb_s, emn_s, bvn_s,
                *, S, nz, chunk, mode, phase=0, seg=None, KE=8):
    """Backward+posterior wavefront (high-to-low over grid steps).

    bci_refs: optional (bi1, bi2, bii, biem, bibv) carry-in refs holding
    (B_{k1}, B_{k1+1}, 1/mb_{k1}, em_{k1}, bridgevec_{k1}) of the row just
    ABOVE this segment — None for the batch path / the final segment
    (zero/identity init, the recursion's natural start past row L).
    bco_refs: optional matching carry-out refs, written on the group's
    last grid step (the segment's LOWEST row) for the next-lower segment.
    """
    cr = pl.program_id(1)
    sc = (None if seg is None else
          _seg_make_consts(seg, efx_ref.shape[-1], KE))

    @pl.when(cr == 0)
    def _():
        if bci_refs is None:
            b1_s[...] = jnp.zeros_like(b1_s)
            b2_s[...] = jnp.zeros_like(b2_s)
            invb_s[...] = jnp.ones_like(invb_s)
            emn_s[...] = jnp.zeros_like(emn_s)
            bvn_s[...] = jnp.zeros_like(bvn_s)
        else:
            bi1, bi2, bii, biem, bibv = bci_refs
            b1_s[...] = bi1[0]
            b2_s[...] = bi2[0]
            invb_s[...] = bii[0]
            emn_s[...] = biem[0]
            bvn_s[...] = bibv[0]

    x_targets = sorted({t for cl, f, t in nz if cl == 0})
    y_targets = sorted({t for cl, f, t in nz if cl == 2})
    m_targets = sorted({t for cl, f, t in nz if cl == 1})

    def body(i, carry, do_norm=True):
        B1, B2, invb, em_next, bvn = carry
        ii = chunk - 1 - i
        efx = efx_ref[0, ii]
        efy = efy_ref[0, ii]
        efm = efm_ref[0, ii]
        em_own = em_ref[0, ii]
        abw = abw_ref[0, ii] != 0
        c1 = c1_ref[0, ii] != 0
        c0 = c0_ref[0, ii] != 0
        bm1 = bm1_ref[0, ii] != 0
        bm0 = bm0_ref[0, ii] != 0
        pm = pm_ref[0, ii]

        # receive from k+1: x-class at shift 1-d1 in {0,1}; y at -d1 in
        # {-1,0}; from k+2: m-class at shift 1-dsum2 in {-1,0,1}
        bxe = {t: jnp.where(abw, B1[t], _shift_l(B1[t])) * efx
               for t in x_targets}
        bye = {t: jnp.where(abw, _shift_r(B1[t]), B1[t]) * efy
               for t in y_targets}
        efmi = efm * invb
        bme = {t: jnp.where(c1, _shift_r(B2[t]),
                            jnp.where(c0, B2[t], _shift_l(B2[t]))) * efmi
               for t in m_targets}

        raw = [None] * S
        for cl, f, t in nz:
            term = (bxe[t] if cl == 0 else bme[t] if cl == 1 else bye[t])
            term = term * t_ref[cl * S + f, t]
            raw[f] = term if raw[f] is None else raw[f] + term
        zero = jnp.zeros_like(efx)
        raw = [zero if r_ is None else r_ for r_ in raw]

        at_end = (pm & _PM_ATEND) != 0  # (G, W), row-constant
        ae_f = at_end.astype(jnp.float32)
        # per-pair float mask: a (G, 1) column unpacked (row-constant),
        # the full lane tile packed (row-constant per segment; dead lanes
        # read 0 but every value stream there is 0 too)
        ae_col = ae_f[:, :1] if seg is None else ae_f
        for f in range(S):
            raw[f] = jnp.where(at_end, end_ref[0, f], raw[f])

        if do_norm:
            if seg is None:
                m = jnp.max(raw[0], axis=-1, keepdims=True)
                for f in range(1, S):
                    m = jnp.maximum(
                        m, jnp.max(raw[f], axis=-1, keepdims=True))
            else:
                mv = raw[0]
                for f in range(1, S):
                    mv = jnp.maximum(mv, raw[f])
                m = _seg_max_bcast(mv, seg, sc)
            # m := m where (m > 0 and not at_end) else 1, float arithmetic
            good = (m > 0).astype(jnp.float32) * (1.0 - ae_col)
            m = m * good + (1.0 - good)
            r = 1.0 / m
            B_new = tuple(raw[f] * r for f in range(S))
            if seg is None:
                mb_row = jnp.log(m)
            else:
                mp = _seg_pick(m, sc)
                mb_row = jnp.log(jnp.where(mp > 0, mp, 1.0))
        else:
            r = jnp.ones_like(ae_col)
            B_new = tuple(raw)
            mb_row = jnp.zeros_like(mb_ref[0, ii])

        # per-diagonal total: dot + bridge (reference :636-653)
        F_row = [f_ref[0, ii, s] for s in range(S)]
        br_sh = jnp.where(bm1, _shift_l(bvn), jnp.where(bm0, bvn, _shift_r(bvn)))
        if seg is None:
            dot = jnp.sum(F_row[0] * B_new[0], axis=-1, keepdims=True)
            for s in range(1, S):
                dot = dot + jnp.sum(F_row[s] * B_new[s], axis=-1,
                                    keepdims=True)
            bridge = jnp.sum(br_sh * em_next * B1[0], axis=-1, keepdims=True)
            bvalid = ((pm & _PM_BRIDGE) != 0).astype(jnp.float32)[:, :1]
            total = dot + bridge * r * bvalid
            tot_ok = (total > 0).astype(jnp.float32)
            invt = tot_ok / (total + (1.0 - tot_ok))
            tot_ref[0, ii] = jnp.log(total + (1.0 - tot_ok)) * tot_ok
        else:
            dvec = F_row[0] * B_new[0]
            for s in range(1, S):
                dvec = dvec + F_row[s] * B_new[s]
            bvalid = ((pm & _PM_BRIDGE) != 0).astype(jnp.float32)
            total = _seg_sum_bcast(
                dvec + br_sh * em_next * B1[0] * r * bvalid, sc)
            tot_ok = (total > 0).astype(jnp.float32)
            invt = tot_ok / (total + (1.0 - tot_ok))
            tk = _seg_pick(total, sc)
            okk = (tk > 0).astype(jnp.float32)
            tot_ref[0, ii] = jnp.log(tk + (1.0 - okk)) * okk

        mb_ref[0, ii] = mb_row

        post_m_ref[0, ii] = jnp.where(
            (pm & _PM_MATCH) != 0, F_row[0] * B_new[0] * invt, 0.0)
        if mode == "posterior_all":
            post_x_ref[0, ii] = jnp.where(
                (pm & _PM_GAPX) != 0, F_row[1] * B_new[1] * invt, 0.0)
            post_y_ref[0, ii] = jnp.where(
                (pm & _PM_GAPY) != 0, F_row[2] * B_new[2] * invt, 0.0)

        B2_new = tuple(B1[t] * (1.0 - ae_f) for t in range(S))
        invb_new = jnp.broadcast_to(r * (1.0 - ae_col) + ae_col, invb.shape)
        return (B_new, B2_new, invb_new, em_own, bv_ref[0, ii])

    init = (tuple(b1_s[t] for t in range(S)),
            tuple(b2_s[t] for t in range(S)),
            invb_s[...], emn_s[...], bvn_s[...])

    # Rows descend (ii = chunk-1-i); skip-normalize on the same global
    # diagonal schedule as the forward kernel: norm iff
    # (ii + phase) % NORM_EVERY == NORM_EVERY-1, which for the unrolled
    # slot r (i = i4*NORM_EVERY + r, chunk % NORM_EVERY == 0) is r == phase.
    def body4(i4, carry):
        for rr in range(NORM_EVERY):
            carry = body(i4 * NORM_EVERY + rr, carry, do_norm=rr == phase)
        return carry

    B1c, B2c, invbc, emnc, bvnc = jax.lax.fori_loop(
        0, chunk // NORM_EVERY, body4, init)
    for t in range(S):
        b1_s[t] = B1c[t]
        b2_s[t] = B2c[t]
    invb_s[...] = invbc
    emn_s[...] = emnc
    bvn_s[...] = bvnc

    if bco_refs is not None:
        bo1, bo2, boi, boem, bobv = bco_refs

        @pl.when(cr == pl.num_programs(1) - 1)
        def _():
            for t in range(S):
                bo1[0, t] = B1c[t]
                bo2[0, t] = B2c[t]
            boi[0] = invbc
            boem[0] = emnc
            bobv[0] = bvnc


# ---------------------------------------------------------------------------
# Backward + expectation kernel (EM E-step)
# ---------------------------------------------------------------------------


def _exp_kernel(t_ref, efx_ref, efy_ref, efm_ref, em_ref, ex_ref, ey_ref,
                f_ref, fh_ref, fhc_ref, bv_ref, abw_ref, c1_ref, c0_ref,
                bm1_ref, bm0_ref, a_ref, b1_ref, b0_ref, pm_ref, end_ref,
                adj1_ref, adj2_ref, wx_ref, wy_ref, bci_refs,
                mb_ref, tot_ref, trans_ref, emis_ref, bco_refs,
                b1_s, b2_s, invb_s, emn_s, bvn_s, tacc_s, eacc_s,
                *, S, nz, chunk, phase=0, seg=None, KE=8):
    """Same backward recursion as _bwd_kernel plus expected-count
    accumulation (semantics of diagonalCalculationExpectations /
    updateExpectations, reference impl/pairwiseAligner.c:735-746,
    :418-438): per cell, p = F_prev[f] * T_c * e_c * B_k[t] / total_k
    flows into trans[f, t] and (via the cell's symbol pair) emis[t, a, b].

    Neighbor F rows are re-read from the forward output with a 2-row halo
    block; their scale adjustments exp(-mf_k) and exp(-mf_k - mf_{k-1})
    arrive as precomputed per-row streams (adj1/adj2), with adj1 zeroed at
    k < 1 and adj2 at k < 2 so boundary garbage never contributes.
    Expected counts accumulate in VMEM vector accumulators (one (G, W)
    lane-accumulator per active transition and per (state, symx, symy)
    cell) and reduce to the (S, S) / (S, 4, 4) outputs on each pair
    group's final grid step.

    Segment support (ops/fb_segmented.py expectation mode): fhc_ref is
    an optional (1, 2, S, G, W) carry halo holding the TRUE rows
    (k0-2, k0-1) just below the segment (used in place of fh_ref on the
    segment's lowest chunk); bci_refs / bco_refs are the same backward
    carry-in/out 5-tuples as _bwd_kernel. All None in the batch path.
    """
    cr = pl.program_id(1)
    nc = pl.num_programs(1)
    sc = (None if seg is None else
          _seg_make_consts(seg, efx_ref.shape[-1], KE))

    @pl.when(cr == 0)
    def _():
        if bci_refs is None:
            b1_s[...] = jnp.zeros_like(b1_s)
            b2_s[...] = jnp.zeros_like(b2_s)
            invb_s[...] = jnp.ones_like(invb_s)
            emn_s[...] = jnp.zeros_like(emn_s)
            bvn_s[...] = jnp.zeros_like(bvn_s)
        else:
            bi1, bi2, bii, biem, bibv = bci_refs
            b1_s[...] = bi1[0]
            b2_s[...] = bi2[0]
            invb_s[...] = bii[0]
            emn_s[...] = biem[0]
            bvn_s[...] = bibv[0]
        tacc_s[...] = jnp.zeros_like(tacc_s)
        eacc_s[...] = jnp.zeros_like(eacc_s)

    x_targets = sorted({t for cl, f, t in nz if cl == 0})
    y_targets = sorted({t for cl, f, t in nz if cl == 2})
    m_targets = sorted({t for cl, f, t in nz if cl == 1})
    xs_rows = sorted({f for cl, f, t in nz if cl == 0})
    ys_rows = sorted({f for cl, f, t in nz if cl == 2})
    mid_rows = sorted({f for cl, f, t in nz if cl == 1})

    def body(i, do_norm=True):
        ii = chunk - 1 - i
        efx = efx_ref[0, ii]
        efy = efy_ref[0, ii]
        efm = efm_ref[0, ii]
        em_own = em_ref[0, ii]
        abw = abw_ref[0, ii] != 0
        c1 = c1_ref[0, ii] != 0
        c0 = c0_ref[0, ii] != 0
        bm1 = bm1_ref[0, ii] != 0
        bm0 = bm0_ref[0, ii] != 0
        pm = pm_ref[0, ii]

        B1 = [b1_s[t] for t in range(S)]
        B2 = [b2_s[t] for t in range(S)]
        invb = invb_s[...]
        em_next = emn_s[...]
        bvn = bvn_s[...]

        bxe = {t: jnp.where(abw, B1[t], _shift_l(B1[t])) * efx
               for t in x_targets}
        bye = {t: jnp.where(abw, _shift_r(B1[t]), B1[t]) * efy
               for t in y_targets}
        efmi = efm * invb
        bme = {t: jnp.where(c1, _shift_r(B2[t]),
                            jnp.where(c0, B2[t], _shift_l(B2[t]))) * efmi
               for t in m_targets}

        raw = [None] * S
        for cl, f, t in nz:
            term = (bxe[t] if cl == 0 else bme[t] if cl == 1 else bye[t])
            term = term * t_ref[cl * S + f, t]
            raw[f] = term if raw[f] is None else raw[f] + term
        zero = jnp.zeros_like(efx)
        raw = [zero if r_ is None else r_ for r_ in raw]

        at_end = (pm & _PM_ATEND) != 0
        ae_f = at_end.astype(jnp.float32)
        ae_col = ae_f[:, :1] if seg is None else ae_f
        for f in range(S):
            raw[f] = jnp.where(at_end, end_ref[0, f], raw[f])

        if do_norm:
            if seg is None:
                m = jnp.max(raw[0], axis=-1, keepdims=True)
                for f in range(1, S):
                    m = jnp.maximum(
                        m, jnp.max(raw[f], axis=-1, keepdims=True))
            else:
                mv = raw[0]
                for f in range(1, S):
                    mv = jnp.maximum(mv, raw[f])
                m = _seg_max_bcast(mv, seg, sc)
            good = (m > 0).astype(jnp.float32) * (1.0 - ae_col)
            m = m * good + (1.0 - good)
            r = 1.0 / m
            B_new = [raw[f] * r for f in range(S)]
            if seg is None:
                mb_row = jnp.log(m)
            else:
                mp = _seg_pick(m, sc)
                mb_row = jnp.log(jnp.where(mp > 0, mp, 1.0))
        else:
            r = jnp.ones_like(ae_col)
            B_new = list(raw)
            mb_row = jnp.zeros_like(mb_ref[0, ii])

        F_row = [f_ref[0, ii, s] for s in range(S)]
        br_sh = jnp.where(bm1, _shift_l(bvn), jnp.where(bm0, bvn, _shift_r(bvn)))
        if seg is None:
            dot = jnp.sum(F_row[0] * B_new[0], axis=-1, keepdims=True)
            for s in range(1, S):
                dot = dot + jnp.sum(F_row[s] * B_new[s], axis=-1,
                                    keepdims=True)
            bridge = jnp.sum(br_sh * em_next * B1[0], axis=-1, keepdims=True)
            bvalid = ((pm & _PM_BRIDGE) != 0).astype(jnp.float32)[:, :1]
            total = dot + bridge * r * bvalid
            tot_ok = (total > 0).astype(jnp.float32)
            invt = tot_ok / (total + (1.0 - tot_ok))
            tot_ref[0, ii] = jnp.log(total + (1.0 - tot_ok)) * tot_ok
        else:
            dvec = F_row[0] * B_new[0]
            for s in range(1, S):
                dvec = dvec + F_row[s] * B_new[s]
            bvalid = ((pm & _PM_BRIDGE) != 0).astype(jnp.float32)
            total = _seg_sum_bcast(
                dvec + br_sh * em_next * B1[0] * r * bvalid, sc)
            tot_ok = (total > 0).astype(jnp.float32)
            invt = tot_ok / (total + (1.0 - tot_ok))
            tk = _seg_pick(total, sc)
            okk = (tk > 0).astype(jnp.float32)
            tot_ref[0, ii] = jnp.log(tk + (1.0 - okk)) * okk

        mb_ref[0, ii] = mb_row

        # ---- expectation accumulation ----
        a_m = a_ref[0, ii] != 0
        b1_m = b1_ref[0, ii] != 0
        b0_m = b0_ref[0, ii] != 0
        # per-pair neighbor scale adjustments, zero for diagonals < 1 / < 2:
        # (G, 1) columns unpacked, (G, KE) per-pair lanes packed (expanded
        # to segment-broadcast lane tiles by the selection transpose)
        adj1 = adj1_ref[0, ii]
        adj2 = adj2_ref[0, ii]
        if seg is not None:
            adj1 = _seg_expand(adj1, sc)
            adj2 = _seg_expand(adj2, sc)
        exa = ex_ref[0, ii] * adj1
        eya = ey_ref[0, ii] * adj1
        ema = em_own * adj2

        # neighbor F rows: row ii-1 / ii-2 from the block, halo when the
        # row falls in the next (already processed) chunk; boundary rows
        # k<1 / k<2 are killed by the adj masks so clamped garbage is fine
        g1 = (ii >= 1).astype(jnp.float32)
        g2 = (ii >= 2).astype(jnp.float32)
        i1 = jnp.maximum(ii - 1, 0)
        i2 = jnp.maximum(ii - 2, 0)
        ih = jnp.minimum(ii, 1)
        if fhc_ref is None:
            halo = lambda hx, s: fh_ref[0, hx, s]
        else:
            # the segment's lowest chunk runs on the LAST grid step; its
            # below-segment halo rows come from the carry halo
            low = (cr == nc - 1).astype(jnp.float32)
            halo = lambda hx, s: (fhc_ref[0, hx, s] * low
                                  + fh_ref[0, hx, s] * (1.0 - low))
        Fm1 = [f_ref[0, i1, s] * g1 + halo(1, s) * (1.0 - g1)
               for s in range(S)]
        Fm2 = [f_ref[0, i2, s] * g2 + halo(ih, s) * (1.0 - g2)
               for s in range(S)]

        nxe = {f: jnp.where(a_m, Fm1[f], _shift_r(Fm1[f])) * exa
               for f in xs_rows}
        nye = {f: jnp.where(a_m, _shift_l(Fm1[f]), Fm1[f]) * eya
               for f in ys_rows}
        nme = {f: jnp.where(b1_m, _shift_l(Fm2[f]),
                            jnp.where(b0_m, Fm2[f], _shift_r(Fm2[f]))) * ema
               for f in mid_rows}

        Bw = [B_new[t] * invt for t in range(S)]
        q = [zero] * S
        for idx, (cl, f, t) in enumerate(nz):
            n_e = (nxe[f] if cl == 0 else nme[f] if cl == 1 else nye[f])
            tacc_s[idx] = tacc_s[idx] + n_e * Bw[t]
            q[t] = q[t] + n_e * t_ref[cl * S + f, t]

        wx = wx_ref[0, ii]
        wy = wy_ref[0, ii]
        sidx = jnp.where((wx < 4) & (wy < 4), wx * 4 + wy, 16)
        for ab in range(16):
            mask = (sidx == ab).astype(jnp.float32)
            for t in range(S):
                eacc_s[t * 16 + ab] = eacc_s[t * 16 + ab] + q[t] * Bw[t] * mask

        for t in range(S):
            b2_s[t] = B1[t] * (1.0 - ae_f)
            b1_s[t] = B_new[t]
        invb_s[...] = jnp.broadcast_to(r * (1.0 - ae_col) + ae_col, invb.shape)
        emn_s[...] = em_own
        bvn_s[...] = bv_ref[0, ii]
        return 0

    # descending rows; same global skip-norm schedule as _bwd_kernel
    # (norm at unrolled slot r == phase, see there)
    def body4(i4, _):
        for rr in range(NORM_EVERY):
            body(i4 * NORM_EVERY + rr, do_norm=rr == phase)
        return 0

    jax.lax.fori_loop(0, chunk // NORM_EVERY, body4, 0)

    @pl.when(cr == nc - 1)
    def _():
        # scalar scatter is unsupported in Mosaic; build the small output
        # tensors by accumulating scalar * one-hot(iota) masks instead
        vals = {}
        for idx, (cl, f, t) in enumerate(nz):
            v = jnp.sum(tacc_s[idx]) * t_ref[cl * S + f, t]
            vals[(f, t)] = v if (f, t) not in vals else vals[(f, t)] + v
        fi = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        ti = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        trans = jnp.zeros((S, S), jnp.float32)
        for (f, t), v in vals.items():
            trans = trans + v * ((fi == f) & (ti == t)).astype(jnp.float32)
        trans_ref[0] = trans
        si = jax.lax.broadcasted_iota(jnp.int32, (S, 4, 4), 0)
        ai = jax.lax.broadcasted_iota(jnp.int32, (S, 4, 4), 1)
        bi = jax.lax.broadcasted_iota(jnp.int32, (S, 4, 4), 2)
        emis = jnp.zeros((S, 4, 4), jnp.float32)
        for t in range(S):
            for ab in range(16):
                v = jnp.sum(eacc_s[t * 16 + ab])
                mask = ((si == t) & (ai == ab // 4) & (bi == ab % 4))
                emis = emis + v * mask.astype(jnp.float32)
        emis_ref[0] = emis

    if bco_refs is not None:
        bo1, bo2, boi, boem, bobv = bco_refs

        @pl.when(cr == nc - 1)
        def _():
            for t in range(S):
                bo1[0, t] = b1_s[t]
                bo2[0, t] = b2_s[t]
            boi[0] = invb_s[...]
            boem[0] = emn_s[...]
            bobv[0] = bvn_s[...]


# ---------------------------------------------------------------------------
# Host/XLA-side precompute and wrappers
# ---------------------------------------------------------------------------


def _precompute_one(params, sx, sy, offsets, widths, lx, ly,
                    ragged_left, ragged_right, width, rows):
    """Per-pair (vmapped) stream preparation: masked emissions, shift-select
    masks, posterior bitfield, F0 and end rows. All row dims padded to
    `rows`."""
    W = width
    S = params["start"].shape[0]
    P = offsets.shape[0] - 1
    prob = _fb._prob_params(params)
    L = lx + ly

    xoff, delta, jlo, jhi = _fb._frame_from_band(offsets, widths)

    LX = sx.shape[0]
    LY = sy.shape[0]
    sx_s = jnp.where(jnp.arange(LX) < lx, sx, _fb._SENTINEL).astype(jnp.int8)
    sy_s = jnp.where(jnp.arange(LY) < ly, sy, _fb._SENTINEL).astype(jnp.int8)
    sy_rev = jnp.flip(sy_s)
    pad = jnp.full((W + 1,), _fb._SENTINEL, jnp.int8)
    sx_pad = jnp.concatenate([pad, sx_s, pad])
    sy_pad = jnp.concatenate([pad, sy_rev, pad])
    wx, wy = _fb._symbol_windows_matmul(sx_pad, sy_pad, xoff, delta, LY, W)

    e_x, e_y, e_m = _fb._emissions(prob, wx[:, :W], wy[:, 1:])
    ef_x, ef_y, ef_m = _fb._emissions(prob, wx[:, 1:], wy[:, :W])

    js = jnp.arange(W, dtype=jnp.int32)
    ks = jnp.arange(P + 1, dtype=jnp.int32)
    slot_ok = (js[None, :] >= jlo[:, None]) & (js[None, :] <= jhi[:, None])
    fm = slot_ok.astype(jnp.float32)
    e_x, e_y, e_m = e_x * fm, e_y * fm, e_m * fm
    ef_x, ef_y, ef_m = ef_x * fm, ef_y * fm, ef_m * fm

    d_km1 = jnp.concatenate([delta[:1], delta[:-1]])
    dmid = delta + d_km1 - 1
    zeros2 = jnp.zeros((2,), delta.dtype)
    delta_pad = jnp.concatenate([delta, zeros2])
    d1 = delta_pad[1:P + 2]
    dsum2 = d1 + delta_pad[2:P + 3]
    dmid1 = jnp.concatenate([dmid[1:], jnp.zeros((1,), dmid.dtype)])

    # Row-constant shift-select masks, broadcast over the W lanes so the
    # kernels consume uniform (G, W) int8 tiles.
    i8 = lambda cond: jnp.broadcast_to(
        cond[:, None], (P + 1, W)).astype(jnp.int8)
    a = i8(delta == 1)
    b1 = i8(dmid == 1)
    b0 = i8(dmid == 0)
    abw = i8(d1 == 1)
    c1 = i8(dsum2 == 2)
    c0 = i8(dsum2 == 1)
    bm1 = i8(dmid1 == 1)
    bm0 = i8(dmid1 == 0)

    xs = xoff[:, None] + js[None, :]
    ys = ks[:, None] - xs
    valid_k = ((ks >= 1) & (ks <= L))[:, None]
    pm = (jnp.where(valid_k & slot_ok & (xs > 0) & (ys > 0), _PM_MATCH, 0)
          | jnp.where(valid_k & slot_ok & (xs > 0), _PM_GAPX, 0)
          | jnp.where(valid_k & slot_ok & (ys > 0), _PM_GAPY, 0)
          | jnp.where((ks == L)[:, None], _PM_ATEND, 0)
          | jnp.where(((ks >= 1) & (ks < L))[:, None], _PM_BRIDGE, 0))
    pm = pm.astype(jnp.int8)

    start_vec = jnp.where(ragged_left, prob["ragged_start"], prob["start"])
    F0 = jnp.zeros((S, W), jnp.float32).at[:, 0].set(start_vec)
    m0 = jnp.max(F0)
    m0 = jnp.where(m0 > 0, m0, 1.0)
    F0 = F0 / m0

    end_vec = jnp.where(ragged_right, prob["ragged_end"], prob["end"])
    slot_ok_L = jax.lax.dynamic_index_in_dim(
        fm, jnp.clip(L, 0, P), axis=0, keepdims=False)
    end_row = end_vec[:, None] * slot_ok_L[None, :]

    def padr(arr, fill=0):
        cfg = [(0, rows - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, cfg, constant_values=fill)

    return {
        "ex": padr(e_x), "ey": padr(e_y), "em": padr(e_m),
        "efx": padr(ef_x), "efy": padr(ef_y), "efm": padr(ef_m),
        "a": padr(a), "b1": padr(b1), "b0": padr(b0),
        "abw": padr(abw), "c1": padr(c1), "c0": padr(c0),
        "bm1": padr(bm1), "bm0": padr(bm0), "pm": padr(pm),
        "wx": padr(wx[:, :W].astype(jnp.int32), fill=_fb._SENTINEL),
        "wy": padr(wy[:, 1:].astype(jnp.int32), fill=_fb._SENTINEL),
        "F0": F0, "m0log": jnp.log(m0)[None], "end_row": end_row,
        "xoff": xoff, "jlo": jlo, "jhi": jhi, "L": L,
    }


def _group(arr, NG, G):
    """(B, rows, ...) -> (NG, rows, G, ...) kernel layout."""
    s = arr.shape
    return jnp.transpose(
        arr.reshape((NG, G) + s[1:]),
        (0, 2, 1) + tuple(range(3, arr.ndim + 1)))


@functools.partial(
    jax.jit,
    static_argnames=("nz", "S", "mode", "width", "rows", "interpret",
                     "chunk", "group", "pack", "seg"))
def _fb_wavefront_jit(params, sx, sy, offsets, widths, lx, ly,
                      ragged_left, ragged_right, nz, S, mode, width, rows,
                      interpret, chunk, group, pack=1, seg=0):
    B = sx.shape[0]
    W = width
    G = group
    K = pack
    # lane packing (K > 1): K pairs per sublane row, each in a seg-lane
    # segment; per-pair scalar streams (mf/mb/total/adj) ride KD lanes
    KD = 1 if K == 1 else ((K + 7) // 8) * 8
    WL = W if K == 1 else K * seg
    kseg = None if K == 1 else seg
    GP = G * K  # pairs per program tile
    if B % GP != 0:
        padn = (-B) % GP
        rep = lambda arr: jnp.concatenate(
            [arr] + [arr[-1:]] * padn, axis=0)
        zpad = lambda arr: jnp.concatenate(
            [arr, jnp.zeros((padn,) + arr.shape[1:], arr.dtype)], axis=0)
        sx, sy = rep(sx), rep(sy)
        offsets, widths = rep(offsets), rep(widths)
        # zero lengths: padded pairs emit nothing and contribute zero
        # expected counts (their emissions and scale-adjust streams vanish)
        lx, ly = zpad(lx), zpad(ly)
        ragged_left, ragged_right = rep(ragged_left), rep(ragged_right)
    NB = sx.shape[0]
    NG = NB // GP
    CHUNK_ = chunk
    NC = rows // CHUNK_

    pre = jax.vmap(
        lambda *args: _precompute_one(params, *args, width=W, rows=rows)
    )(sx, sy, offsets, widths, lx, ly, ragged_left, ragged_right)

    if K == 1:
        g_row = lambda k, fill=0: _group(pre[k], NG, G)  # (NG, rows, G, [W])
    else:
        def g_row(key, fill=0):
            # (NB, rows, W) -> (NG, rows, G, K*seg): pair b = (ng, g, k)
            # packs into segment k of sublane g; lanes W..seg-1 are dead
            # (zero emissions keep the DP values there exactly zero)
            arr = jnp.pad(pre[key], [(0, 0), (0, 0), (0, seg - W)],
                          constant_values=fill)
            arr = arr.reshape(NG, G, K, rows, seg)
            return jnp.transpose(arr, (0, 3, 1, 2, 4)).reshape(
                NG, rows, G, WL)
    ex, ey, em = g_row("ex"), g_row("ey"), g_row("em")
    a, b1, b0 = g_row("a"), g_row("b1"), g_row("b0")
    if K == 1:
        F0 = jnp.transpose(pre["F0"].reshape(NG, G, S, W), (0, 2, 1, 3))
    else:
        F0 = jnp.pad(pre["F0"], [(0, 0), (0, 0), (0, seg - W)])
        F0 = jnp.transpose(F0.reshape(NG, G, K, S, seg),
                           (0, 3, 1, 2, 4)).reshape(NG, S, G, WL)

    t_prob = jnp.exp(params["t"]).reshape(3 * S, S)

    kp = dict(interpret=interpret)
    vmem = pltpu.VMEM
    row_spec = lambda last: pl.BlockSpec(
        (1, CHUNK_, G) + last, lambda g, c: (g, c, 0) + (0,) * len(last),
        memory_space=vmem)

    fwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NG, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # transitions
            row_spec((WL,)), row_spec((WL,)), row_spec((WL,)),  # ex ey em
            row_spec((WL,)), row_spec((WL,)), row_spec((WL,)),  # a b1 b0
            pl.BlockSpec((1, S, G, WL), lambda g, c: (g, 0, 0, 0),
                         memory_space=vmem),  # F0
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK_, S, G, WL), lambda g, c: (g, c, 0, 0, 0),
                         memory_space=vmem),  # F
            row_spec((WL,)),  # bridgevec
            row_spec((KD,)),  # mf
        ],
        scratch_shapes=[
            pltpu.VMEM((S, G, WL), jnp.float32),  # F_{k-1}
            pltpu.VMEM((S, G, WL), jnp.float32),  # U_{k-1}
            pltpu.VMEM((G, 1 if K == 1 else WL), jnp.float32),  # 1/m_{k-1}
        ],
    )
    def _fwd_wrapper(*refs):
        ins, outs, scr = refs[:8], refs[8:11], refs[11:]
        _fwd_kernel(*ins, None, None, *outs, None, None, None, *scr,
                    S=S, nz=nz, chunk=CHUNK_, fresh=True, seg=kseg, KE=KD)

    F_all, bridgevec, mf = pl.pallas_call(
        _fwd_wrapper,
        grid_spec=fwd_grid,
        out_shape=[
            jax.ShapeDtypeStruct((NG, rows, S, G, WL), jnp.float32),
            jax.ShapeDtypeStruct((NG, rows, G, WL), jnp.float32),
            jax.ShapeDtypeStruct((NG, rows, G, KD), jnp.float32),
        ],
        **kp,
    )(t_prob, ex, ey, em, a, b1, b0, F0)

    if K == 1:
        mf_b = jnp.transpose(mf[..., 0], (0, 2, 1)).reshape(NB, rows)
    else:
        mf_b = jnp.transpose(mf, (0, 2, 3, 1))[:, :, :K].reshape(NB, rows)
    mf_b = mf_b.at[:, 0].add(pre["m0log"][:, 0])

    # forward log prob at diagonal L (end-state dot), per pair
    P = offsets.shape[1] - 1
    L = pre["L"]
    end_vec_rows = pre["end_row"]  # (NB, S, W) — end vec already masked
    if K == 1:
        F_rows = jnp.transpose(F_all, (0, 3, 1, 2, 4)).reshape(
            NB, rows, S, W)
        FL = jax.vmap(lambda f, l: jax.lax.dynamic_index_in_dim(
            f, jnp.clip(l, 0, P), axis=0, keepdims=False))(F_rows, L)
    else:
        # gather the per-pair end rows from the packed layout first (one
        # small (NG, S, G, WL) tensor), then unpack — avoids ever
        # materializing an unpacked F_all copy
        Lg = jnp.clip(L, 0, P).reshape(NG, G, K).astype(jnp.int32)
        Lidx = jnp.repeat(Lg, seg, axis=-1)[:, None, None]  # (NG,1,1,G,WL)
        FLp = jnp.take_along_axis(
            F_all, jnp.broadcast_to(Lidx, (NG, 1, S, G, WL)), axis=1)[:, 0]
        FL = jnp.transpose(FLp.reshape(NG, S, G, K, seg),
                           (0, 2, 3, 1, 4)).reshape(NB, S, seg)[..., :W]
    # end_row = end_vec * slot_ok; F is zero off-band so the dot matches
    # einsum(F[L], end_vec)
    log_fwd = jnp.log(jnp.einsum("bsw,bsw->b", FL, end_vec_rows,
                                 precision=jax.lax.Precision.HIGHEST))

    out = {"mf": mf_b[:B, :P + 1], "log_fwd": log_fwd[:B]}
    if mode == "forward":
        return out

    efx, efy, efm = g_row("efx"), g_row("efy"), g_row("efm")
    abw, c1, c0 = g_row("abw"), g_row("c1"), g_row("c0")
    bm1, bm0, pm = g_row("bm1"), g_row("bm0"), g_row("pm")
    if K == 1:
        end_row = jnp.transpose(
            pre["end_row"].reshape(NG, G, S, W), (0, 2, 1, 3))
    else:
        end_row = jnp.pad(pre["end_row"], [(0, 0), (0, 0), (0, seg - W)])
        end_row = jnp.transpose(end_row.reshape(NG, G, K, S, seg),
                                (0, 3, 1, 2, 4)).reshape(NG, S, G, WL)

    if K == 1:
        uncol = lambda arr: jnp.transpose(arr[..., 0], (0, 2, 1)).reshape(
            NB, rows)[:B, :P + 1]
        unrow = lambda arr: jnp.transpose(arr, (0, 2, 1, 3)).reshape(
            NB, rows, W)[:B, :P + 1]
    else:
        uncol = lambda arr: jnp.transpose(
            arr, (0, 2, 3, 1))[:, :, :K].reshape(NB, rows)[:B, :P + 1]
        unrow = lambda arr: jnp.transpose(
            arr.reshape(NG, rows, G, K, seg),
            (0, 2, 3, 1, 4)).reshape(NB, rows, seg)[:B, :P + 1, :W]

    if mode == "expectation":
        CH = max(8, CHUNK_ // 2)
        NC2 = rows // CH
        wx = g_row("wx", fill=_fb._SENTINEL)
        wy = g_row("wy", fill=_fb._SENTINEL)
        ks = jnp.arange(rows)
        # neighbor scale adjustments, zeroed at the boundary rows they
        # must not touch (k<1 for F_{k-1}, k<2 for F_{k-2})
        adj1 = jnp.exp(-mf) * (ks >= 1)[None, :, None, None]
        mf_km1 = jnp.concatenate([jnp.zeros_like(mf[:, :1]), mf[:, :-1]],
                                 axis=1)
        adj2 = jnp.exp(-(mf + mf_km1)) * (ks >= 2)[None, :, None, None]

        erow = lambda last: pl.BlockSpec(
            (1, CH, G) + last,
            lambda g, c: (g, NC2 - 1 - c, 0) + (0,) * len(last),
            memory_space=vmem)
        halo_spec = pl.BlockSpec(
            (1, 2, S, G, WL),
            lambda g, c: (g,
                          jnp.maximum((NC2 - 1 - c) * (CH // 2) - 1, 0),
                          0, 0, 0),
            memory_space=vmem)
        exp_grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NG, NC2),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # transitions
                erow((WL,)), erow((WL,)), erow((WL,)),  # ef*
                erow((WL,)), erow((WL,)), erow((WL,)),  # em ex ey
                pl.BlockSpec((1, CH, S, G, WL),
                             lambda g, c: (g, NC2 - 1 - c, 0, 0, 0),
                             memory_space=vmem),  # F
                halo_spec,  # F halo (rows c*CH-2, c*CH-1)
                erow((WL,)),  # bridgevec
                erow((WL,)), erow((WL,)), erow((WL,)),  # abw c1 c0
                erow((WL,)), erow((WL,)),  # bm1 bm0
                erow((WL,)), erow((WL,)), erow((WL,)),  # a b1 b0
                erow((WL,)),  # pm
                pl.BlockSpec((1, S, G, WL), lambda g, c: (g, 0, 0, 0),
                             memory_space=vmem),  # end rows
                erow((KD,)), erow((KD,)),  # adj1 adj2
                erow((WL,)), erow((WL,)),  # wx wy
            ],
            out_specs=[
                erow((KD,)), erow((KD,)),  # mb, total_raw
                pl.BlockSpec((1, S, S), lambda g, c: (g, 0, 0),
                             memory_space=vmem),
                pl.BlockSpec((1, S, 4, 4), lambda g, c: (g, 0, 0, 0),
                             memory_space=vmem),
            ],
            scratch_shapes=[
                pltpu.VMEM((S, G, WL), jnp.float32),  # B_{k+1}
                pltpu.VMEM((S, G, WL), jnp.float32),  # B_{k+2}
                pltpu.VMEM((G, 1 if K == 1 else WL), jnp.float32),  # 1/mb
                pltpu.VMEM((G, WL), jnp.float32),  # em_next
                pltpu.VMEM((G, WL), jnp.float32),  # bridgevec_{k+1}
                pltpu.VMEM((len(nz), G, WL), jnp.float32),  # trans acc
                pltpu.VMEM((S * 16, G, WL), jnp.float32),  # emis acc
            ],
        )
        def _exp_wrapper(*refs):
            ins = refs[:24]
            outs = refs[24:28]
            scr = refs[28:]
            _exp_kernel(*ins[:9], None, *ins[9:], None, *outs, None, *scr,
                        S=S, nz=nz, chunk=CH, seg=kseg, KE=KD)

        mb, tot, trans, emis = pl.pallas_call(
            _exp_wrapper,
            grid_spec=exp_grid,
            out_shape=[
                jax.ShapeDtypeStruct((NG, rows, G, KD), jnp.float32),
                jax.ShapeDtypeStruct((NG, rows, G, KD), jnp.float32),
                jax.ShapeDtypeStruct((NG, S, S), jnp.float32),
                jax.ShapeDtypeStruct((NG, S, 4, 4), jnp.float32),
            ],
            **kp,
        )(t_prob, efx, efy, efm, em, ex, ey, F_all, F_all, bridgevec,
          abw, c1, c0, bm1, bm0, a, b1, b0, pm, end_row, adj1, adj2, wx, wy)

        out["mb"] = uncol(mb)
        out["total_raw"] = uncol(tot)
        out["trans"] = jnp.sum(trans, axis=0)
        out["emis"] = jnp.sum(emis, axis=0)
        return out

    rrow_spec = lambda last: pl.BlockSpec(
        (1, CHUNK_, G) + last,
        lambda g, c: (g, NC - 1 - c, 0) + (0,) * len(last),
        memory_space=vmem)

    n_out = 3 if mode == "posterior_all" else 1
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NG, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # transitions
            rrow_spec((WL,)), rrow_spec((WL,)), rrow_spec((WL,)),  # ef*
            rrow_spec((WL,)),  # em (own-cell match emissions)
            pl.BlockSpec((1, CHUNK_, S, G, WL),
                         lambda g, c: (g, NC - 1 - c, 0, 0, 0),
                         memory_space=vmem),  # F
            rrow_spec((WL,)),  # bridgevec
            rrow_spec((WL,)), rrow_spec((WL,)), rrow_spec((WL,)),  # abw c1 c0
            rrow_spec((WL,)), rrow_spec((WL,)), rrow_spec((WL,)),  # bm1 bm0 pm
            pl.BlockSpec((1, S, G, WL), lambda g, c: (g, 0, 0, 0),
                         memory_space=vmem),  # end rows
        ],
        out_specs=[rrow_spec((WL,))] * n_out + [rrow_spec((KD,))] * 2,
        scratch_shapes=[
            pltpu.VMEM((S, G, WL), jnp.float32),  # B_{k+1}
            pltpu.VMEM((S, G, WL), jnp.float32),  # B_{k+2}
            pltpu.VMEM((G, 1 if K == 1 else WL), jnp.float32),  # 1/mb_{k+1}
            pltpu.VMEM((G, WL), jnp.float32),  # em_next
            pltpu.VMEM((G, WL), jnp.float32),  # bridgevec_{k+1}
        ],
    )

    def bwd_wrapper(*refs):
        ins = refs[:14]
        posts_ = refs[14:14 + n_out]
        mbr, totr = refs[14 + n_out:16 + n_out]
        scr = refs[16 + n_out:]
        if n_out == 1:
            posts_ = (posts_[0], None, None)
        _bwd_kernel(*ins, None, *posts_, mbr, totr, None, *scr,
                    S=S, nz=nz, chunk=CHUNK_, mode=mode, seg=kseg, KE=KD)

    *posts, mb_o, tot_o = pl.pallas_call(
        bwd_wrapper,
        grid_spec=bwd_grid,
        out_shape=[jax.ShapeDtypeStruct((NG, rows, G, WL), jnp.float32)]
        * n_out
        + [jax.ShapeDtypeStruct((NG, rows, G, KD), jnp.float32)] * 2,
        **kp,
    )(t_prob, efx, efy, efm, em, F_all, bridgevec,
      abw, c1, c0, bm1, bm0, pm, end_row)

    out["mb"] = uncol(mb_o)
    out["total_raw"] = uncol(tot_o)
    out["post_match"] = unrow(posts[0])
    if mode == "posterior_all":
        out["post_gap_x"] = unrow(posts[1])
        out["post_gap_y"] = unrow(posts[2])
    return out


def supported(mode: str) -> bool:
    return mode in ("forward", "posterior_match", "posterior_all",
                    "expectation")


# Measured per-cell throughput of the diagonal body relative to G=8 on a
# v5e chip (the body's fixed per-step cost — loop control, SMEM scalar
# reads, shift setup — amortizes over more sublane tiles as G grows;
# vector-issue cost scales linearly so gains flatten out).
_GROUP_SPEED = {8: 1.00, 16: 1.26, 32: 1.47, 64: 1.55, 128: 1.60}

# VMEM envelope for one double-buffered stream block, in (G * chunk * W)
# cells. The default is the measured v5e compile ceiling for the widest
# kernel variant (backward with the segment-carry refs). It is NOT
# trusted as folklore: a VMEM compile OOM at dispatch shrinks the tiles,
# records the working envelope, and persists it per device kind
# (~/.cache/cpecan_tpu_tiles.json), so the choice self-heals on other
# TPU generations or future kernel stream changes.
_ENVELOPE_DEFAULT = 98304
_envelope_live: dict = {}


def _tile_cache_path() -> str:
    import os

    return os.environ.get(
        "CPECAN_TPU_TILE_CACHE",
        os.path.expanduser("~/.cache/cpecan_tpu_tiles.json"))


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _envelope(We: int = 128) -> int:
    """Current VMEM envelope (cells per stream block): learned value for
    this device kind AND lane width if one was recorded, else the v5e
    default.  Keyed per lane width so a VMEM-OOM heal on an ultra-wide
    window (streaming long pairs can see thousands of lanes) never
    throttles the narrow-lane batch shapes."""
    kind = f"{_device_kind()}|w{int(We)}"
    if kind in _envelope_live:
        return _envelope_live[kind]
    import json
    import os

    env = _ENVELOPE_DEFAULT
    try:
        with open(_tile_cache_path()) as fh:
            env = int(json.load(fh).get(kind, _ENVELOPE_DEFAULT))
    except Exception:
        pass
    _envelope_live[kind] = env
    return env


def _record_envelope(cells: int, We: int = 128) -> None:
    """Persist a smaller working envelope (on disk, per device kind and
    lane width)."""
    kind = f"{_device_kind()}|w{int(We)}"
    _envelope_live[kind] = cells
    import json
    import os

    path = _tile_cache_path()
    data = {}
    try:
        with open(path) as fh:
            data = json.load(fh)
    except Exception:
        pass
    data[kind] = cells
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(data, fh)
    except Exception:
        pass


def _is_vmem_oom(err: Exception) -> bool:
    msg = str(err)
    if ("memory space vmem" in msg or "scoped vmem" in msg
            or "vmem limit" in msg.lower()):
        return True
    # Remote-compile services (the axon tunnel) report compile failures
    # as an opaque HTTP 500 from the compile helper; the VMEM detail only
    # reaches the terminal log.  Treat it as shrinkable: the retry loop
    # is bounded (log2 of the tile sizes) and re-raises if shrinking
    # never helps, so a genuine compiler bug still surfaces.
    return ("remote_compile" in msg and "HTTP 500" in msg
            and "compile" in msg)


def pack_factor(W: int) -> int:
    """Lane-packing factor for band width W: how many pairs share one
    128-lane row (each in a 128//K-lane segment, dead-lane separated).
    1 (no packing) for W > 62 or when CPECAN_TPU_NO_PACK is set."""
    import os

    if W > 62 or os.environ.get("CPECAN_TPU_NO_PACK"):
        return 1
    return 128 // (W + 1)


def pick_tiles(B: int, W: int, P: int, S: int, mode: str, pack: int = 1):
    """Choose (pair group G, diagonal chunk) for the kernel grid.

    G rides the sublane dimension: bigger groups amortize the sequential
    per-diagonal overhead (see _GROUP_SPEED) but pad the batch up to a
    multiple of G (times the lane-packing factor) and grow every VMEM
    block. The score maximizes measured speed x useful fraction of the
    padded batch, subject to the VMEM envelope; the expectation kernel's
    per-group accumulators (len(nz) + 16*S lane accumulators) cap its
    group at 64.
    """
    cap = 64 if mode == "expectation" else 128
    We = max(W, 128)  # VMEM blocks pad the lane (W) dimension to 128
    envelope = _envelope(We)
    best, best_score = 8, 0.0
    g = 8
    while g <= cap and g * 8 * We <= envelope:
        padded = -(-B // (g * pack)) * (g * pack)
        score = _GROUP_SPEED[g] * B / padded
        if score > best_score:
            best, best_score = g, score
        g *= 2
    group = best
    # shrink the pair group when even one group's slice of the F_all HBM
    # intermediate would blow the budget (long unanchored pairs: huge
    # rows x wide bands); the dispatcher separately slices the batch so
    # the whole-batch F_all stays bounded too
    per_pair = (P + 1 + 64) * S * W * 4
    while group > 1 and group * per_pair * pack > _F_ALL_BUDGET:
        group //= 2
    # expectation: multiple of 8 so the half-chunk and its 2-row halo
    # block indexing stay aligned; posterior kernels only need the
    # NORM_EVERY schedule alignment (ultra-wide streaming windows can
    # need chunk 4 to fit scoped VMEM at all)
    q = 8 if mode == "expectation" else NORM_EVERY
    chunk = max(q, min(CHUNK, (envelope // (group * We)) // q * q))
    return group, chunk


def shrink_tiles(group: int, chunk: int, W: int, min_chunk: int = 8):
    """One VMEM-OOM healing step: halve the larger tile dimension and
    lower the IN-MEMORY envelope so this process's later pick_tiles
    start there.  Returns the new (group, chunk) or None when already
    minimal.  min_chunk=NORM_EVERY is legal for the posterior kernels
    (the grid only needs chunk % NORM_EVERY == 0); the expectation
    kernel's half-chunk halo indexing keeps the default floor of 8.
    Nothing is persisted here: callers confirm_tiles() after the shrunk
    configuration actually compiles, so a transient or kernel-specific
    OOM cannot permanently throttle the device kind."""
    We = max(W, 128)
    if chunk > min_chunk:
        chunk //= 2
    elif group > 8:
        group //= 2
    else:
        return None
    _envelope_live[f"{_device_kind()}|w{We}"] = group * chunk * We
    return group, chunk


def confirm_tiles(group: int, chunk: int, W: int) -> None:
    """Persist the envelope of a shrunk-and-verified tile configuration
    (called only after the retry compiled and ran)."""
    We = max(W, 128)
    _record_envelope(group * chunk * We, We)


def fb_pass_batch_wavefront(params, sx, sy, offsets, widths, lx, ly,
                            ragged_left, ragged_right,
                            mode: str = "posterior_match", width: int = 0,
                            interpret: bool | None = None, nz=None):
    """Batched banded FB pass via the Pallas wavefront kernels.

    Same contract as ops.fb_batch.fb_pass_batch for every mode (in
    expectation mode trans/emis come back batch-summed, with per-pair mb
    and total_raw for the host-side float64 likelihood recombination).
    `interpret=None` auto-selects interpreter mode off-TPU (tests on CPU
    run the same kernel code path). `nz` (static transition triples) must
    be supplied when params are tracers — e.g. under shard_map or an
    outer jit — since the structure can't be read off a traced tensor.
    """
    if not supported(mode):
        raise ValueError(f"wavefront engine does not support mode={mode!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if nz is None:
        nz = nonzero_transitions_of(params["t"])
    S = int(params["start"].shape[0])
    P = offsets.shape[1] - 1
    W = int(width)
    B = int(sx.shape[0])
    K = pack_factor(W)
    seg = 128 // K if K > 1 else 0
    group, chunk = pick_tiles(B, W, P, S, mode, pack=K)

    # The F_all forward intermediate is materialized for the whole batch
    # (B x rows x S x W floats); slice the batch so each device call stays
    # inside the HBM budget (group-sized multiples keep the grid shape —
    # and the compiled executable — identical across slices).
    per_pair = (P + 1 + 64) * S * (seg if K > 1 else W) * 4
    gk = group * K
    bmax = max(gk, (_F_ALL_BUDGET // per_pair) // gk * gk)
    if B > bmax:
        outs = []
        for i in range(0, B, bmax):
            sl = slice(i, min(i + bmax, B))
            outs.append(fb_pass_batch_wavefront(
                params, sx[sl], sy[sl], offsets[sl], widths[sl], lx[sl],
                ly[sl], ragged_left[sl], ragged_right[sl], mode=mode,
                width=width, interpret=interpret, nz=nz))
        return {k: (sum(o[k] for o in outs) if k in ("trans", "emis")
                    else jnp.concatenate([o[k] for o in outs], axis=0))
                for k in outs[0]}

    shrunk = False
    while True:
        rows = -(-(P + 1) // chunk) * chunk
        try:
            out = _fb_wavefront_jit(
                params, jnp.asarray(sx), jnp.asarray(sy),
                jnp.asarray(offsets), jnp.asarray(widths), jnp.asarray(lx),
                jnp.asarray(ly), jnp.asarray(ragged_left),
                jnp.asarray(ragged_right),
                nz, S, mode, W, rows, bool(interpret), chunk, group,
                pack=K, seg=seg)
            if shrunk:
                confirm_tiles(group, chunk, W)
            return out
        except Exception as e:  # VMEM compile OOM: shrink tiles and retry
            min_chunk = 8 if mode == "expectation" else NORM_EVERY
            smaller = (shrink_tiles(group, chunk, W, min_chunk)
                       if _is_vmem_oom(e) else None)
            if smaller is None:
                raise
            group, chunk = smaller
            shrunk = True
