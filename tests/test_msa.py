"""Multiple-aligner tests mirroring the reference suite
(tests/multipleAlignerTest.c): little fixed fragments, alignment validity
via fresh poset insertion, randomized MSA trials, distance matrix values."""

import random

import numpy as np
import pytest

from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.state_machine import state_machine5
from cpecan_tpu.msa.columns import ColumnStore, PosetAlignment
from cpecan_tpu.msa import aligner
from cpecan_tpu.msa.aligner import (
    SeqFrag, MultipleAlignment, make_alignment, make_alignment_using_all_pairs,
    filter_pairwise_alignment_to_make_pairs_ordered, get_distance_matrix,
    get_reference_pairwise_alignments, MULTIPLE_PAIR_DTYPE,
)
from cpecan_tpu.utils.logmath import PAIR_ALIGNMENT_PROB_1
from cpecan_tpu.utils.symbols import get_random_sequence, evolve_sequence


def little_seq_frags():
    # reference fixture (tests/multipleAlignerTest.c:21-47)
    return [SeqFrag("AGTTT", 0, 0), SeqFrag("AGTGTG", 0, 0),
            SeqFrag("AC", 0, 1), SeqFrag("", 1, 1)]


def check_alignment(seq_frags, mpairs):
    """Validity: every pair insertable into a fresh poset (reference
    checkAlignment :58-86)."""
    poset = PosetAlignment([f.length for f in seq_frags])
    for p in mpairs:
        score, s1, p1, s2, p2 = (int(p["prob"]), int(p["seq1"]), int(p["pos1"]),
                                 int(p["seq2"]), int(p["pos2"]))
        assert score <= PAIR_ALIGNMENT_PROB_1
        assert 0 <= s1 < len(seq_frags)
        assert 0 <= p1 < seq_frags[s1].length
        assert 0 <= s2 < len(seq_frags)
        assert 0 <= p2 < seq_frags[s2].length
        assert poset.add(s1, p1, s2, p2)


class TestColumns:
    def test_make_columns_count(self):
        store = ColumnStore([f.length for f in little_seq_frags()])
        assert len(store.all_columns()) == 13  # reference :50-55

    def test_poset_consistency(self):
        poset = PosetAlignment([5, 5])
        assert poset.add(0, 0, 1, 0)
        assert poset.add(0, 2, 1, 2)
        # crossing pair is inconsistent
        assert not poset.add(0, 3, 1, 1)
        assert not poset.add(0, 1, 1, 3)
        # consistent in-between pair
        assert poset.add(0, 1, 1, 1)

    def test_poset_transitive(self):
        poset = PosetAlignment([3, 3, 3])
        assert poset.add(0, 1, 1, 1)
        assert poset.add(1, 1, 2, 1)
        # (0,1) now aligned to (2,1) transitively; crossing (0,2)-(2,0) invalid
        assert not poset.add(0, 2, 2, 1)
        assert not poset.add(0, 1, 2, 0)
        assert poset.add(0, 2, 2, 2)


class TestMakeAlignment:
    def test_all_pairs_little(self):
        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        frags = little_seq_frags()
        mA = make_alignment_using_all_pairs(sm, frags, False, 0.0, p)
        check_alignment(frags, mA.aligned_pairs)
        assert len(mA.aligned_pairs) > 0

    @pytest.mark.parametrize("progressive", [False, True])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_all_pairs_random(self, progressive, seed):
        rng = random.Random(seed)
        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        base = get_random_sequence(40, rng)
        frags = [SeqFrag(evolve_sequence(base, rng),
                         rng.random() > 0.5, rng.random() > 0.5)
                 for _ in range(4)]
        mA = make_alignment_using_all_pairs(sm, frags, progressive, 0.5, p)
        check_alignment(frags, mA.aligned_pairs)

    @pytest.mark.parametrize("progressive", [False, True])
    def test_spanning_tree_alignment(self, progressive):
        rng = random.Random(3)
        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        base = get_random_sequence(50, rng)
        frags = [SeqFrag(evolve_sequence(base, rng)) for _ in range(6)]
        mA = make_alignment(sm, frags, spanning_trees=2,
                            max_pairs_to_consider=10000,
                            use_progressive_merging=progressive,
                            match_gamma=0.5, p=p)
        check_alignment(frags, mA.aligned_pairs)
        # chosen pairwise alignments: n-1 from the first tree, plus later rounds
        assert len(mA.chosen_pairwise_alignments) >= len(frags) - 1

    def test_reference_pair_choice(self):
        frags = little_seq_frags()
        pairs = get_reference_pairwise_alignments(frags)
        assert len(pairs) == len(frags) - 1
        # each pair unique, valid indices
        assert len(set(pairs)) == len(pairs)
        for a, b in pairs:
            assert 0 <= a < b < len(frags)

    def test_distance_matrix(self):
        """Exact distance counts on a hand-made two-column alignment
        (reference :181-216 pattern)."""
        frags = [SeqFrag("AC"), SeqFrag("AG")]
        store = ColumnStore([2, 2])
        from cpecan_tpu.msa.columns import ColumnDag
        dag = ColumnDag(store)
        assert dag.add_pair_if_consistent(0, 0, 1, 0)
        assert dag.add_pair_if_consistent(0, 1, 1, 1)
        subs, idents = get_distance_matrix(store, frags, 1 << 30)
        assert idents[0, 1] == 1  # A-A
        assert subs[0, 1] == 1  # C-G


class TestPairwiseFilter:
    @pytest.mark.parametrize("seed", range(3))
    def test_filter_makes_ordered(self, seed):
        """The poset filter output is a consistent pairwise alignment
        (reference test :218-232 / cPecanRealign's default decode)."""
        from cpecan_tpu.align import pairwise

        rng = random.Random(seed)
        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        x = get_random_sequence(50, rng)
        y = evolve_sequence(x, rng)
        if not x or not y:
            x, y = "ACGTACGT", "ACGACGT"
        raw = pairwise.get_aligned_pairs(sm, x, y, p)
        filtered = filter_pairwise_alignment_to_make_pairs_ordered(raw, x, y, 0.5)
        # consistency: insertable into a fresh 2-seq poset
        poset = PosetAlignment([len(x), len(y)])
        for q in filtered:
            assert poset.add(0, int(q["x"]), 1, int(q["y"]))
        assert len(filtered) <= len(raw)

    def test_filter_keeps_high_weight(self):
        """A dominant consistent diagonal survives the filter."""
        from cpecan_tpu.align import pairwise

        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        x = "ACGGTCATTACGGTCAAT"
        raw = pairwise.get_aligned_pairs(sm, x, x, p)
        filtered = filter_pairwise_alignment_to_make_pairs_ordered(raw, x, x, 0.2)
        diag = {(int(q["x"]), int(q["y"])) for q in filtered}
        hits = sum(1 for i in range(len(x)) if (i, i) in diag)
        assert hits >= len(x) - 2


class TestDistanceMatrixParity:
    @pytest.mark.parametrize("seed", range(3))
    def test_vectorized_matches_naive(self, seed):
        """The vectorized distance matrix (incl. the max-pairs column
        cutoff) matches the direct member-pair loop on random merged
        stores."""
        import random as _random

        from cpecan_tpu.msa.aligner import _distance_matrix_naive
        from cpecan_tpu.msa.columns import ColumnDag, ColumnStore
        from cpecan_tpu.utils.symbols import get_random_sequence

        rng = _random.Random(seed)
        frags = [SeqFrag(get_random_sequence(rng.randint(10, 30), rng), i, i + 1)
                 for i in range(6)]
        store = ColumnStore([f.length for f in frags])
        dag = ColumnDag(store)
        for _ in range(120):
            s1, s2 = rng.sample(range(len(frags)), 2)
            p1 = rng.randrange(frags[s1].length)
            p2 = rng.randrange(frags[s2].length)
            dag.add_pair_if_consistent(s1, p1, s2, p2)
        for max_pairs in (0, 3, 17, 1 << 30):
            got = get_distance_matrix(store, frags, max_pairs)
            want = _distance_matrix_naive(store, frags, max_pairs)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
