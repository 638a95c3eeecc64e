"""Property tests of the end-to-end pairwise alignment APIs — the
reference's randomized invariants (tests/pairwiseAlignerTest.c:344-401,
:649-715) plus MEA/left-shift cross-checks (:733-991)."""

import random

import numpy as np
import pytest

from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.state_machine import state_machine5, state_machine3
from cpecan_tpu.models.hmm import Hmm, StateMachineType
from cpecan_tpu.align import pairwise
from cpecan_tpu.align.anchors import (
    get_blast_pairs, filter_to_remove_overlap, get_anchors)
from cpecan_tpu.align.split import get_split_points
from cpecan_tpu.ops.mea import mea_alignment, left_shift_alignment
from cpecan_tpu.ops import pairs as pairs_mod
from cpecan_tpu.utils.logmath import PAIR_ALIGNMENT_PROB_1
from cpecan_tpu.utils.symbols import get_random_sequence, evolve_sequence


def small_params(**kw):
    return PairwiseAlignmentParameters(**kw)


def check_aligned_pairs(pairs, lx, ly):
    """Structural invariants (reference checkAlignedPairs :344-381)."""
    seen = set()
    for p in pairs:
        prob, x, y = int(p["prob"]), int(p["x"]), int(p["y"])
        assert 0 < prob <= PAIR_ALIGNMENT_PROB_1
        assert 0 <= x < lx
        assert 0 <= y < ly
        assert (x, y) not in seen
        seen.add((x, y))


class TestGetAlignedPairs:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_pairs(self, seed):
        rng = random.Random(seed)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(rng.randint(0, 60), rng)
        y = evolve_sequence(x, rng)
        pairs = pairwise.get_aligned_pairs(sm, x, y, p)
        check_aligned_pairs(pairs, len(x), len(y))

    def test_identical_sequences_high_posterior(self):
        sm = state_machine5()
        p = small_params()
        x = "ACGTACGGCATTACGGCATGCAGG"
        pairs = pairwise.get_aligned_pairs(sm, x, x, p)
        diag = {(int(q["x"]), int(q["y"])): int(q["prob"]) for q in pairs}
        for i in range(2, len(x) - 2):
            assert diag.get((i, i), 0) > 0.5 * PAIR_ALIGNMENT_PROB_1, i

    def test_with_indels_modes(self):
        rng = random.Random(5)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(40, rng)
        y = evolve_sequence(x, rng)
        m, gx, gy = pairwise.get_aligned_pairs_with_indels(sm, x, y, p)
        check_aligned_pairs(m, len(x), len(y))
        for q in gx:
            assert 0 <= q["x"] < len(x)
        for q in gy:
            assert 0 <= q["y"] < len(y)

    def test_ragged_ends_planted_core(self):
        """Core sequence in random flanks aligns at the right offset
        (reference test_getAlignedPairsWithRaggedEnds :676-715)."""
        rng = random.Random(11)
        core = "ATTGCGGCATATCGGCTTACGGCATGGCGAT"
        flank_x = get_random_sequence(20, rng).upper()
        flank_y = get_random_sequence(25, rng).upper()
        x = flank_x + core
        y = core + flank_y
        sm = state_machine5()
        p = small_params()
        pairs = pairwise.get_aligned_pairs(
            sm, x, y, p, ragged_left=True, ragged_right=True)
        # the core must dominate: most matched pairs have x - y == 20
        on_core = sum(1 for q in pairs if q["x"] - q["y"] == len(flank_x)
                      and q["prob"] > 0.5 * PAIR_ALIGNMENT_PROB_1)
        assert on_core >= len(core) - 4

    def test_forward_prob_self_alignment_is_max(self):
        """P(X,Y) <= P(X,X) (reference :1157-1188)."""
        rng = random.Random(3)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(30, rng)
        y = evolve_sequence(x, rng)
        pxx = pairwise.compute_forward_probability(x, x, [], p, sm)
        pxy = pairwise.compute_forward_probability(x, y, [], p, sm)
        assert pxx >= pxy

    def test_expectations_accumulate(self):
        rng = random.Random(4)
        sm = state_machine5()
        p = small_params()
        hmm = Hmm(StateMachineType.fiveState)
        x = get_random_sequence(30, rng)
        y = evolve_sequence(x, rng)
        if not x or not y:
            x, y = "ACGT", "ACGT"
        pairwise.get_expectations(sm, hmm, x, y, p)
        assert hmm.transitions.sum() > 0
        assert hmm.emissions.sum() > 0
        assert hmm.likelihood != 0


class TestSplitting:
    def test_split_points_reference_shapes(self):
        # no anchors, big matrix: splits into bounded chunks
        sp = get_split_points([], 1000, 1000, 100 * 100, False, False)
        for x1, y1, x2, y2 in sp:
            assert (x2 - x1) <= 2 * 100 + 1 and (y2 - y1) <= 2 * 100 + 1
        # coverage of the corners
        assert sp[0][:2] == (0, 0)
        assert sp[-1][2:] == (1000, 1000)

    def test_split_respects_ragged(self):
        sp = get_split_points([], 1000, 1000, 100 * 100, True, True)
        # ragged both ends with no anchors: no blocks at all
        assert sp == []

    def test_aligned_pairs_with_splitting(self):
        """Small split threshold forces the chunked path; identical
        sequences must still produce the identity diagonal."""
        rng = random.Random(9)
        sm = state_machine5()
        # N-free sequence: N runs break k-mer anchoring, and anchor-free gap
        # middles are excluded from alignment by design (reference
        # getSplitPointsP cuts out the middle of oversized gaps, :1206-1228)
        x = "".join(rng.choice("ACGT") for _ in range(120))
        p = small_params(splitMatrixBiggerThanThis=30 * 30,
                         anchorMatrixBiggerThanThis=20 * 20,
                         constraintDiagonalTrim=2)
        pairs = pairwise.get_aligned_pairs(sm, x, x, p)
        check_aligned_pairs(pairs, len(x), len(x))
        diag = {(int(q["x"]), int(q["y"])): int(q["prob"]) for q in pairs}
        hits = sum(1 for i in range(len(x)) if diag.get((i, i), 0) > 0.5 * PAIR_ALIGNMENT_PROB_1)
        assert hits >= len(x) - 12


class TestAnchors:
    def test_seed_chain_identity(self):
        rng = random.Random(2)
        x = get_random_sequence(400, rng).upper()
        pairs = get_blast_pairs(x, x, trim=0, expansion=4, repeat_mask=True)
        xy = {(a, b) for a, b, _ in pairs}
        # nearly the full identity diagonal should be recovered
        hits = sum(1 for i in range(len(x)) if (i, i) in xy)
        assert hits > len(x) * 0.6

    def test_filter_to_remove_overlap_brute_force(self):
        """Cross-check vs brute-force monotone filtering (reference
        :496-553 pattern)."""
        rng = random.Random(6)
        for _ in range(20):
            pts = sorted({(rng.randint(0, 20), rng.randint(0, 20))
                          for _ in range(rng.randint(0, 25))})
            pairs = [(x, y, 0) for x, y in pts]
            out = [tuple(int(v) for v in row)
                   for row in filter_to_remove_overlap(pairs)]
            # output must be strictly monotone in both coordinates
            for (a, b, _), (c, d, _) in zip(out, out[1:]):
                assert a < c and b < d
            # every output pair must be in the input
            assert set(out) <= set(pairs)

    def test_get_anchors_monotone(self):
        rng = random.Random(8)
        x = get_random_sequence(900, rng)
        y = evolve_sequence(x, rng)
        p = small_params(anchorMatrixBiggerThanThis=100 * 100)
        anchors = get_anchors(x, y, p)
        for (a, b, _), (c, d, _) in zip(anchors, anchors[1:]):
            assert a < c and b < d


def naive_mea(aligned_pairs, gap_x, gap_y, lx, ly, gamma):
    """O(n^2) MEA without the high-score prune (the reference's independent
    naive reimplementation, tests/pairwiseAlignerTest.c:733-802)."""
    from cpecan_tpu.ops.mea import _cumulative_gap_probs, _indel_prob
    cgx = _cumulative_gap_probs(gap_x, lx, True)
    cgy = _cumulative_gap_probs(gap_y, ly, False)
    n = len(aligned_pairs)
    best = [0.0] * (n + 1)
    for i in range(n + 1):
        if i == n:
            mp, x, y = 0, lx, ly
        else:
            q = aligned_pairs[i]
            mp, x, y = int(q["prob"]), int(q["x"]), int(q["y"])
        s = mp + (_indel_prob(cgx, 0, x) + _indel_prob(cgy, 0, y)) * gamma
        for j in range(i):
            q2 = aligned_pairs[j]
            x2, y2 = int(q2["x"]), int(q2["y"])
            if x2 < x and y2 < y:
                cand = mp + best[j] + (
                    _indel_prob(cgx, x2 + 1, x - x2 - 1)
                    + _indel_prob(cgy, y2 + 1, y - y2 - 1)) * gamma
                s = max(s, cand)
        best[i] = s
    return best[n]


class TestMEA:
    @pytest.mark.parametrize("seed", range(3))
    def test_vs_naive(self, seed):
        rng = random.Random(seed)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(35, rng)
        y = evolve_sequence(x, rng)
        if not x or not y:
            x, y = "ACGTAC", "ACGTTC"
        m, gx, gy = pairwise.get_aligned_pairs_with_indels(sm, x, y, p)
        alignment, score = mea_alignment(m, gx, gy, len(x), len(y), p.gapGamma)
        naive_score = naive_mea(m, gx, gy, len(x), len(y), p.gapGamma)
        assert abs(score - naive_score) <= 1e-4 * max(1.0, abs(naive_score))
        # alignment is totally ordered
        for q, r in zip(alignment, alignment[1:]):
            assert q["x"] < r["x"] and q["y"] < r["y"]

    def test_left_shift_reference_example(self):
        """Golden left-shift fixture (reference :944-991): aligning
        'AGTTCG' and offset-indel variants shifts indels left."""
        pairs = pairs_mod.make_pairs([10, 10, 10], [2, 3, 4], [1, 2, 3])
        # seq_x has an extra leading base vs seq_y; matching flanks
        seq_x, seq_y = "AAGTC", "AGTC"
        shifted = left_shift_alignment(pairs, seq_x, seq_y)
        # no further left shift possible: for every aligned pair preceded by
        # a gap, the characters at (x-1, y-1) must differ... (reference
        # checkAlignmentIsMaximallyShifted :850-865)
        prev = (len(seq_x), len(seq_y))
        for q in shifted[::-1]:
            x, y = int(q["x"]), int(q["y"])
            assert x < prev[0] and y < prev[1]
            prev = (x, y)

    def test_get_shifted_mea_alignment(self):
        """Composed posteriors -> MEA -> left-shift decode (reference
        getShiftedMEAAlignment :1767-1790): totally ordered, maximally
        shifted, same pair set as composing the stages by hand."""
        rng = random.Random(29)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(40, rng)
        y = evolve_sequence(x, rng)
        if not x or not y:
            x, y = "ACGTACGT", "ACGTCGT"
        from cpecan_tpu.align.anchors import get_anchors
        anchors = get_anchors(x, y, p)
        shifted, score = pairwise.get_shifted_mea_alignment(
            sm, x, y, anchors, p)
        assert np.isfinite(score) and score >= 0
        prev = (len(x), len(y))
        for q in shifted[::-1]:
            cx, cy = int(q["x"]), int(q["y"])
            assert 0 <= cx < prev[0] and 0 <= cy < prev[1]
            prev = (cx, cy)
        # parity with composing the stages by hand
        m, gx, gy = pairwise.get_aligned_pairs_with_indels_using_anchors(
            sm, x, y, anchors, p)
        m = m[np.lexsort((m["x"], m["x"] + m["y"]))]
        alignment, score2 = mea_alignment(m, gx, gy, len(x), len(y), p.gapGamma)
        by_hand = left_shift_alignment(alignment, x, y)
        np.testing.assert_array_equal(shifted["x"], by_hand["x"])
        np.testing.assert_array_equal(shifted["y"], by_hand["y"])
        assert score == score2

    def test_left_shift_maximality(self):
        rng = random.Random(12)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(30, rng)
        y = evolve_sequence(x, rng)
        if not x or not y:
            x, y = "ACGTAC", "ACGTC"
        m, gx, gy = pairwise.get_aligned_pairs_with_indels(sm, x, y, p)
        alignment, _ = mea_alignment(m, gx, gy, len(x), len(y), p.gapGamma)
        shifted = left_shift_alignment(alignment, x, y)
        # maximally shifted check (reference :850-865): any indel directly
        # before a pair cannot have equal flanking chars allowing a shift
        coords = [(int(q["x"]), int(q["y"])) for q in shifted]
        sx, sy = x.upper(), y.upper()
        px, py = len(x), len(y)
        for cx, cy in reversed(coords):
            if px - cx > 1 or py - cy > 1:  # indel before (px,py)
                assert not (px > 0 and py > 0 and sx[px - 1] == sy[py - 1]
                            and (cx, cy) != (px - 1, py - 1))
            px, py = cx, cy


class TestReweighting:
    def test_reweight_subtracts_gap_mass(self):
        pairs = pairs_mod.make_pairs(
            [PAIR_ALIGNMENT_PROB_1, PAIR_ALIGNMENT_PROB_1 // 2], [0, 1], [0, 1])
        out = pairs_mod.reweight_aligned_pairs(pairs, 2, 2, 0.5)
        # pair 0: full match mass, zero indel at x0/y0 -> prob = 1e7 - 0.5*(0+0)
        assert out["prob"][0] == PAIR_ALIGNMENT_PROB_1
        # pair 1: indel mass = 1e7 - 0.5e7 = 0.5e7 on each side
        assert out["prob"][1] == PAIR_ALIGNMENT_PROB_1 // 2 - int(
            0.5 * (PAIR_ALIGNMENT_PROB_1 // 2 + PAIR_ALIGNMENT_PROB_1 // 2))

    def test_gamma_zero_noop(self):
        pairs = pairs_mod.make_pairs([5], [0], [0])
        out = pairs_mod.reweight_aligned_pairs(pairs, 1, 1, 0.0)
        assert out is pairs

    def test_scores_in_range(self):
        """Scores are in [0,100] for a filtered (totally ordered) alignment —
        the reference rescores only after poset filtering
        (cPecanRealign.c:552-564)."""
        rng = random.Random(13)
        sm = state_machine5()
        p = small_params()
        x = get_random_sequence(30, rng)
        y = evolve_sequence(x, rng)
        if not x or not y:
            x, y = "ACGT", "ACGT"
        m, gx, gy = pairwise.get_aligned_pairs_with_indels(sm, x, y, p)
        alignment, _ = mea_alignment(m, gx, gy, len(x), len(y), p.gapGamma)
        for fn in (pairs_mod.score_by_identity,
                   pairs_mod.score_by_identity_ignoring_gaps):
            s = fn(x, y, alignment)
            assert 0 <= s <= 100.001
        assert 0 <= pairs_mod.score_by_posterior_probability(
            len(x), len(y), alignment) <= 100.001
        assert 0 <= pairs_mod.score_by_posterior_probability_ignoring_gaps(
            alignment) <= 100.001


def test_native_mea_matches_python():
    """The native MEA decoder (native/mea.cpp) is bit-compatible with the
    Python loop on random posterior pair lists."""
    import random as _random

    from cpecan_tpu.align import native
    from cpecan_tpu.ops import mea as mea_mod
    from cpecan_tpu.ops.pairs import make_pairs

    if not native.available():
        pytest.skip("native library unavailable")

    rng = _random.Random(11)
    for trial in range(20):
        lx, ly = rng.randint(1, 40), rng.randint(1, 40)
        pts = sorted({(rng.randrange(lx), rng.randrange(ly))
                      for _ in range(rng.randint(0, 60))},
                     key=lambda q: (q[0] + q[1], q[0]))
        match = make_pairs([rng.randint(1, 10**7) for _ in pts],
                           [q[0] for q in pts], [q[1] for q in pts])
        gx = make_pairs([rng.randint(1, 10**6) for q in pts],
                        [q[0] for q in pts], [q[1] for q in pts])
        gy = gx.copy()
        gamma = rng.choice([0.0, 0.5, 0.9])

        cum_x = mea_mod._cumulative_gap_probs(gx, lx, True)
        cum_y = mea_mod._cumulative_gap_probs(gy, ly, False)
        probs = np.ascontiguousarray(match["prob"], np.int64)
        xs = np.ascontiguousarray(match["x"], np.int64)
        ys = np.ascontiguousarray(match["y"], np.int64)

        idx_py, score_py = mea_mod._mea_core_python(
            probs, xs, ys, cum_x, cum_y, lx, ly, gamma)
        idx_c, score_c = native.mea_decode(
            probs, xs, ys, cum_x, cum_y, lx, ly, gamma)
        np.testing.assert_array_equal(idx_c, idx_py)
        assert score_c == score_py
