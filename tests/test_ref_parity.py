"""End-to-end parity against the ACTUAL C reference engine.

Builds /root/reference/impl/{pairwiseAligner,stateMachine}.c UNMODIFIED
against the sonLib shim in native/refparity/ and diffs posterior pair
sets, forward probabilities, and EM expectations on the reference's own
fixture (tests/pairwiseAlignerTest.c:242-324: AGCG vs AGTTCG) and random
evolved pairs.  Tolerance is anchored to the C logAdd lookup's own ~1e-3
error (impl/pairwiseAligner.c:287-307) plus fp32-vs-f64 drift.
"""

import os
import random
import subprocess

import numpy as np
import pytest

from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.state_machine import state_machine5, state_machine3
from cpecan_tpu.models.hmm import StateMachineType
from cpecan_tpu.align import pairwise
from cpecan_tpu.align.anchors import get_anchors
from cpecan_tpu.utils.logmath import PAIR_ALIGNMENT_PROB_1
from cpecan_tpu.utils.symbols import get_random_sequence, evolve_sequence

HERE = os.path.dirname(os.path.abspath(__file__))
REFPARITY_DIR = os.path.join(HERE, os.pardir, "native", "refparity")
REF = os.environ.get("CPECAN_TPU_REFERENCE", "/root/reference")

# Posterior tolerance: the C logAdd is a piecewise-cubic approximation
# with ~1e-3 absolute error in log space, compounded over the ~13
# logAdds per cell in both sweeps; our engines use exact math in fp32
# scaled space.  Observed diffs vs the C binary peak around 2.5e-3, so
# 4e-3 bounds the C approximation error with margin while staying far
# below any decode-relevant scale.
POST_TOL = 4e-3
# Near-threshold pairs may be present in one set and absent in the other.
EDGE = 5e-3


def _binary():
    path = os.path.join(REFPARITY_DIR, "build", "parity_main")
    if not os.path.exists(path):
        subprocess.run(["make", f"REF={REF}"], cwd=REFPARITY_DIR, check=True,
                       capture_output=True)
    return path


@pytest.fixture(scope="module")
def ref_bin():
    if not os.path.isdir(os.path.join(REF, "impl")):
        pytest.skip("reference checkout not available")
    try:
        return _binary()
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"could not build reference: {e.stderr.decode()[-500:]}")


def run_ref(ref_bin, mode, sm_name, seq_x, seq_y, anchors=(), threshold=0.01,
            ragged_left=False, ragged_right=False, expansion=None,
            split_matrix=None):
    anchor_line = " ".join(f"{x},{y},{e}" for x, y, e in anchors)
    inp = f"{seq_x}\n{seq_y}\n{anchor_line}\n"
    argv = [ref_bin, mode, sm_name, str(threshold), str(int(ragged_left)),
            str(int(ragged_right))]
    if expansion is not None or split_matrix is not None:
        argv += ["-", str(-1 if expansion is None else expansion),
                 str(-1 if split_matrix is None else split_matrix)]
    out = subprocess.run(argv, input=inp, capture_output=True, text=True,
                         check=True, timeout=300)
    return out.stdout


def parse_ref_pairs(text, prefix=None):
    d = {}
    for line in text.splitlines():
        if not line.strip():
            continue
        toks = line.split()
        if prefix is not None:
            if toks[0] != prefix:
                continue
            toks = toks[1:]
        elif len(toks) == 4:
            continue
        x, y, p = int(toks[0]), int(toks[1]), float(toks[2])
        d[(x, y)] = p
    return d


def ours_to_dict(pairs):
    return {(int(q["x"]), int(q["y"])): int(q["prob"]) / PAIR_ALIGNMENT_PROB_1
            for q in pairs}


def assert_pair_sets_match(ref_d, our_d, threshold):
    """Shared pairs agree within POST_TOL; one-sided pairs sit near the
    threshold (the only legitimate reason for set mismatch)."""
    shared = set(ref_d) & set(our_d)
    if not shared:
        # Legal only when every pair (on either side) hugs the threshold.
        for d in (ref_d, our_d):
            for k, v in d.items():
                assert v <= threshold + EDGE, (k, v)
        return 0.0
    max_diff = max(abs(ref_d[k] - our_d[k]) for k in shared)
    assert max_diff <= POST_TOL, f"max posterior diff {max_diff}"
    for k in set(ref_d) - set(our_d):
        assert ref_d[k] <= threshold + EDGE, (k, ref_d[k])
    for k in set(our_d) - set(ref_d):
        assert our_d[k] <= threshold + EDGE, (k, our_d[k])
    return max_diff


SM_FACTORIES = {
    "fiveState": lambda: state_machine5(),
    "fiveStateAsymmetric": lambda: state_machine5(
        StateMachineType.fiveStateAsymmetric),
    "threeState": lambda: state_machine3(),
    "threeStateAsymmetric": lambda: state_machine3(
        StateMachineType.threeStateAsymmetric),
}


class TestFixtureParity:
    """The reference's own full-matrix oracle fixture (:242-324)."""

    def test_agcg_agttcg_pair_set(self, ref_bin):
        ref = parse_ref_pairs(
            run_ref(ref_bin, "pairs", "fiveState", "AGCG", "AGTTCG",
                    threshold=0.2))
        assert set(ref) == {(0, 0), (1, 1), (2, 4), (3, 5)}
        sm = state_machine5()
        p = PairwiseAlignmentParameters(threshold=0.2)
        ours = ours_to_dict(
            pairwise.get_aligned_pairs_using_anchors(sm, "AGCG", "AGTTCG",
                                                     [], p))
        assert_pair_sets_match(ref, ours, 0.2)

    def test_agcg_agttcg_indels(self, ref_bin):
        text = run_ref(ref_bin, "indels", "fiveState", "AGCG", "AGTTCG",
                       threshold=0.2)
        ref_m = parse_ref_pairs(text, "M")
        ref_x = parse_ref_pairs(text, "X")
        ref_y = parse_ref_pairs(text, "Y")
        sm = state_machine5()
        p = PairwiseAlignmentParameters(threshold=0.2)
        m, gx, gy = pairwise.get_aligned_pairs_with_indels_using_anchors(
            sm, "AGCG", "AGTTCG", [], p)
        assert_pair_sets_match(ref_m, ours_to_dict(m), 0.2)
        assert_pair_sets_match(ref_x, ours_to_dict(gx), 0.2)
        assert_pair_sets_match(ref_y, ours_to_dict(gy), 0.2)

    def test_forward_probability(self, ref_bin):
        ref = float(run_ref(ref_bin, "forward", "fiveState", "AGCG",
                            "AGTTCG").strip())
        p = PairwiseAlignmentParameters()
        ours = pairwise.compute_forward_probability("AGCG", "AGTTCG", [], p,
                                                    state_machine5())
        assert abs(ref - ours) < 2e-2, (ref, ours)


class TestRandomParity:
    """~20 random evolved pairs across all four model types, unanchored
    (small enough to dodge the reference's lastz threshold) and anchored
    with OUR anchor pipeline's output fed to BOTH engines."""

    @pytest.mark.parametrize("sm_name", list(SM_FACTORIES))
    @pytest.mark.parametrize("seed", range(5))
    def test_unanchored_posteriors(self, ref_bin, sm_name, seed):
        rng = random.Random(1000 * seed + hash(sm_name) % 1000)
        x = get_random_sequence(rng.randint(30, 120), rng)
        y = evolve_sequence(x, rng)
        ref = parse_ref_pairs(
            run_ref(ref_bin, "pairs", sm_name, x, y, threshold=0.01))
        sm = SM_FACTORIES[sm_name]()
        p = PairwiseAlignmentParameters()
        ours = ours_to_dict(
            pairwise.get_aligned_pairs_using_anchors(sm, x, y, [], p))
        assert_pair_sets_match(ref, ours, 0.01)

    @pytest.mark.parametrize("seed", range(3))
    def test_anchored_posteriors(self, ref_bin, seed):
        """Same anchors to both engines: isolates banded-DP parity from
        anchor-generation differences."""
        rng = random.Random(77 + seed)
        x = get_random_sequence(400, rng)
        y = evolve_sequence(x, rng)
        p = PairwiseAlignmentParameters()
        anchors = [(int(a), int(b), int(e)) for a, b, e in
                   np.asarray(get_anchors(x, y, p)).reshape(-1, 3)]
        ref = parse_ref_pairs(
            run_ref(ref_bin, "pairs", "fiveState", x, y, anchors=anchors,
                    threshold=0.01))
        ours = ours_to_dict(
            pairwise.get_aligned_pairs_using_anchors(
                sm := state_machine5(), x, y,
                [(a, b, e) for a, b, e in anchors], p))
        del sm
        assert_pair_sets_match(ref, ours, 0.01)

    @pytest.mark.parametrize("seed", range(3))
    def test_forward_probability_random(self, ref_bin, seed):
        rng = random.Random(31 + seed)
        x = get_random_sequence(rng.randint(50, 150), rng)
        y = evolve_sequence(x, rng)
        ref = float(run_ref(ref_bin, "forward", "fiveState", x, y).strip())
        p = PairwiseAlignmentParameters()
        ours = pairwise.compute_forward_probability(x, y, [], p,
                                                    state_machine5())
        # log-prob tolerance: C logAdd error accumulates ~1e-3 per cell
        # chain; allow relative slack on longer pairs.
        assert abs(ref - ours) < 0.05 + 2e-3 * len(x), (ref, ours)

    def test_ragged_ends(self, ref_bin):
        rng = random.Random(9)
        core = get_random_sequence(60, rng)
        x = get_random_sequence(20, rng) + core
        y = core + get_random_sequence(25, rng)
        ref = parse_ref_pairs(
            run_ref(ref_bin, "pairs", "fiveState", x, y, threshold=0.01,
                    ragged_left=True, ragged_right=True))
        p = PairwiseAlignmentParameters()
        ours = ours_to_dict(
            pairwise.get_aligned_pairs_using_anchors(
                state_machine5(), x, y, [], p, ragged_left=True,
                ragged_right=True))
        assert_pair_sets_match(ref, ours, 0.01)


class TestExpectationParity:
    """EM E-step counts vs the C engine (getExpectationsUsingAnchors ->
    updateExpectations, reference impl/pairwiseAligner.c:1500,:418-438):
    expected transition/emission counts must match within the C logAdd's
    approximation error, relative to each count's magnitude."""

    @pytest.mark.parametrize("seed", range(3))
    def test_expectation_counts(self, ref_bin, seed):
        from cpecan_tpu.models.hmm import Hmm

        rng = random.Random(500 + seed)
        x = get_random_sequence(rng.randint(60, 150), rng)
        y = evolve_sequence(x, rng)
        text = run_ref(ref_bin, "expectations", "fiveState", x, y)
        line1, line2 = [l for l in text.splitlines() if l.strip()][:2]
        toks1 = line1.split()
        S = 5
        ref_trans = np.array(toks1[1:1 + S * S], float).reshape(S, S)
        ref_like = float(toks1[1 + S * S])
        ref_emis16 = np.array(line2.split(), float).reshape(S, 16)

        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        hmm = Hmm(sm.type, pseudo_expectation=1e-12)
        pairwise.get_expectations_using_anchors(sm, hmm, x, y, [], p)

        scale = max(ref_trans.max(), 1.0)
        np.testing.assert_allclose(hmm.transitions, ref_trans,
                                   rtol=2e-2, atol=2e-3 * scale)
        e_scale = max(ref_emis16.max(), 1.0)
        np.testing.assert_allclose(
            hmm.emissions.reshape(S, 16), ref_emis16,
            rtol=2e-2, atol=2e-3 * e_scale)
        assert hmm.likelihood == pytest.approx(ref_like, rel=1e-2)


class TestMeaParity:
    """MEA + left-shift decode vs the C engine (getShiftedMEAAlignment,
    reference :1767-1790).  Near-tied MEA paths can legitimately differ
    when posteriors differ at the logAdd-approximation scale, so assert
    score parity and high pair agreement rather than exact paths."""

    @pytest.mark.parametrize("seed", range(3))
    def test_shifted_mea(self, ref_bin, seed):
        rng = random.Random(900 + seed)
        x = get_random_sequence(rng.randint(50, 140), rng)
        y = evolve_sequence(x, rng)
        text = run_ref(ref_bin, "mea", "fiveState", x, y)
        lines = [l for l in text.splitlines() if l.strip()]
        ref_score = float(lines[0].split()[1]) / PAIR_ALIGNMENT_PROB_1
        ref_pairs = {(int(t[0]), int(t[1]))
                     for t in (l.split() for l in lines[1:])}

        sm = state_machine5()
        p = PairwiseAlignmentParameters()
        pairs, score = pairwise.get_shifted_mea_alignment(sm, x, y, [], p)
        our_pairs = {(int(q["x"]), int(q["y"])) for q in pairs}
        our_score = score / PAIR_ALIGNMENT_PROB_1

        assert our_score == pytest.approx(ref_score, rel=2e-2, abs=0.05)
        if ref_pairs or our_pairs:
            inter = len(ref_pairs & our_pairs)
            union = len(ref_pairs | our_pairs)
            assert inter / union > 0.9, (inter, union)


class TestSplittingParity:
    """Large-gap splitting semantics vs the C engine (getSplitPoints +
    getPosteriorProbsWithBandingSplittingAlignmentsByLargeGaps, reference
    :1206-1326): identical anchors + a tiny split threshold force both
    engines through the split path, including ragged-flag propagation to
    outer chunks only."""

    @pytest.mark.parametrize("ragged", [False, True])
    def test_split_path_posteriors(self, ref_bin, ragged):
        rng = random.Random(4242)
        # two conserved blocks around an unrelated 120 bp middle: a large
        # anchor gap that the tiny split threshold must cut
        a = get_random_sequence(300, rng).upper()
        b = get_random_sequence(300, rng).upper()
        mid_x = get_random_sequence(200, rng).upper()
        mid_y = get_random_sequence(190, rng).upper()
        x = a + mid_x + b
        y = (evolve_sequence(a, rng).upper() + mid_y
             + evolve_sequence(b, rng).upper())
        p = PairwiseAlignmentParameters(splitMatrixBiggerThanThis=50 * 50)
        anchors = [(int(q), int(r), int(e)) for q, r, e in
                   np.asarray(get_anchors(x, y,
                                          PairwiseAlignmentParameters()))
                   .reshape(-1, 3)]
        assert anchors, "need anchors to exercise the split path"
        ref = parse_ref_pairs(
            run_ref(ref_bin, "pairs", "fiveState", x, y, anchors=anchors,
                    threshold=0.01, ragged_left=ragged, ragged_right=ragged,
                    split_matrix=50 * 50))
        ours = ours_to_dict(
            pairwise.get_aligned_pairs_using_anchors(
                state_machine5(), x, y, anchors, p, ragged_left=ragged,
                ragged_right=ragged))
        assert_pair_sets_match(ref, ours, 0.01)


# ---------------------------------------------------------------------------
# MSA layer + realign CLI + EM loop parity (round 5)
# ---------------------------------------------------------------------------

def run_ref_raw(argv, inp, timeout=600):
    """Run a refparity binary with PARITY_ZERO_RANDOM (the C st_random
    jitter pinned to 0; pair CPECAN_TPU_MSA_JITTER=0 on our side)."""
    env = dict(os.environ)
    env["PARITY_ZERO_RANDOM"] = "1"
    out = subprocess.run(argv, input=inp, capture_output=True, text=True,
                         check=True, timeout=timeout, env=env)
    return out.stdout


@pytest.fixture()
def no_jitter(monkeypatch):
    monkeypatch.setenv("CPECAN_TPU_MSA_JITTER", "0")


def make_family(rng, n, length):
    """n sequences evolved from a common ancestor."""
    ancestor = get_random_sequence(length, rng)
    return [evolve_sequence(ancestor, rng).upper() for _ in range(n)]


class TestPosetFilterParity:
    """reweightAlignedPairs2 + filterPairwiseAlignmentToMakePairsOrdered
    (the default cPecanRealign decode path, cPecanRealign.c:552-553) fed
    IDENTICAL integer posterior pairs on both sides."""

    @pytest.mark.parametrize("seed,gap_gamma,match_gamma", [
        (0, 0.5, 0.85), (1, 0.5, 0.85), (2, 0.0, 0.2), (3, 0.9, 0.5),
    ])
    def test_filter_pair_sets(self, ref_bin, no_jitter, seed, gap_gamma,
                              match_gamma):
        from cpecan_tpu.msa import aligner as msa_aligner
        from cpecan_tpu.ops import pairs as pairs_mod

        rng = random.Random(900 + seed)
        x = get_random_sequence(rng.randint(150, 300), rng)
        y = evolve_sequence(x, rng)
        p = PairwiseAlignmentParameters()
        ours_pairs = pairwise.get_aligned_pairs_using_anchors(
            state_machine5(), x, y, [], p)
        lines = "".join(f"{int(q['prob'])} {int(q['x'])} {int(q['y'])}\n"
                        for q in ours_pairs)
        ref_d = parse_ref_pairs(run_ref_raw(
            [_binary(), "poset_filter", str(gap_gamma), str(match_gamma)],
            f"{x}\n{y}\n{lines}"))
        rew = pairs_mod.reweight_aligned_pairs(
            ours_pairs.copy(), len(x), len(y), gap_gamma)
        filt = msa_aligner.filter_pairwise_alignment_to_make_pairs_ordered(
            rew, x, y, match_gamma)
        our_d = ours_to_dict(filt)
        # Same integer input pairs -> the filter decision differs only on
        # float ties; the surviving sets must match exactly here.
        assert set(ref_d) == set(our_d)
        if ref_d:
            assert max(abs(ref_d[k] - our_d[k]) for k in ref_d) <= 2e-6


class TestMsaParity:
    """Column-merge parity on identical inputs (msa_merge mode), plus a
    tolerance-based check of the full makeAlignment pipeline (msa mode,
    where the two pairwise engines' posteriors differ by ~1e-3)."""

    def _family_pairs(self, seqs, p, gap_gamma=0.0):
        """All-pairs posterior pairs as (score, s1, p1, s2, p2) int rows
        plus (score, s1, s2) similarities, computed by OUR engine."""
        from cpecan_tpu.msa.aligner import (MULTIPLE_PAIR_DTYPE,
                                            _get_alignment_score)
        from cpecan_tpu.ops import pairs as pairs_mod

        rows, sims = [], []
        for s1 in range(len(seqs)):
            for s2 in range(s1 + 1, len(seqs)):
                ap = pairwise.get_aligned_pairs_using_anchors(
                    state_machine5(), seqs[s1], seqs[s2], [], p)
                ap = pairs_mod.reweight_aligned_pairs(
                    ap, len(seqs[s1]), len(seqs[s2]), gap_gamma)
                sims.append((_get_alignment_score(ap, len(seqs[s1]),
                                                  len(seqs[s2])), s1, s2))
                for q in ap:
                    rows.append((int(q["prob"]), s1, int(q["x"]), s2,
                                 int(q["y"])))
        mp = np.empty(len(rows), dtype=MULTIPLE_PAIR_DTYPE)
        for i, (sc, s1, p1, s2, p2) in enumerate(rows):
            mp[i] = (sc, s1, p1, s2, p2)
        return rows, mp, sims

    def _our_partition(self, store):
        cols = {}
        for pid in range(store.n_positions):
            cols.setdefault(store.find(pid), []).append(store.seq_pos(pid))
        return {frozenset(v) for v in cols.values()}

    @staticmethod
    def _ref_partition(text):
        it = iter(text.splitlines())
        head = next(it).split()
        assert head[0] == "columns"
        cols = set()
        for _ in range(int(head[1])):
            members = frozenset(
                (int(a), int(b))
                for a, b in (tok.split(",") for tok in next(it).split()))
            cols.add(members)
        return cols

    @pytest.mark.parametrize("mode", ["greedy", "progressive"])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_merge_partition(self, ref_bin, no_jitter, mode, seed):
        from cpecan_tpu.msa import aligner as msa_aligner
        from cpecan_tpu.msa.aligner import SeqFrag

        rng = random.Random(40 + seed)
        seqs = make_family(rng, 4, 120)
        p = PairwiseAlignmentParameters()
        rows, mp, sims = self._family_pairs(seqs, p)
        match_gamma = 0.5
        inp = (f"{len(seqs)}\n"
               + "".join(f"0 0 {s}\n" for s in seqs)
               + f"{len(rows)}\n"
               + "".join(f"{sc} {s1} {p1} {s2} {p2}\n"
                         for sc, s1, p1, s2, p2 in rows)
               + "".join(f"{sc} {s1} {s2}\n" for sc, s1, s2 in sims))
        ref_cols = self._ref_partition(run_ref_raw(
            [_binary(), "msa_merge", mode, str(match_gamma)], inp))
        frags = [SeqFrag(s) for s in seqs]
        if mode == "greedy":
            store = msa_aligner.get_multiple_sequence_alignment(
                frags, mp, match_gamma)
        else:
            store = msa_aligner.get_multiple_sequence_alignment_progressive(
                frags, mp, match_gamma, sims)
        assert self._our_partition(store) == ref_cols

    @pytest.mark.parametrize("use_progressive", [False, True])
    def test_make_alignment_full(self, ref_bin, no_jitter, use_progressive):
        """Full pipeline: each side computes its own posteriors, so the
        partitions may differ at weight boundaries; require the aligned
        pair sets to agree to >= 0.95 Jaccard and the chosen spanning
        pairs to be identical."""
        from cpecan_tpu.msa import aligner as msa_aligner
        from cpecan_tpu.msa.aligner import SeqFrag

        rng = random.Random(77)
        seqs = make_family(rng, 4, 100)
        inp = f"{len(seqs)}\n" + "".join(f"0 0 {s}\n" for s in seqs)
        out = run_ref_raw(
            [_binary(), "msa", "fiveState", "0.01", "0", "0", "-", "-1",
             "-1", "2", "10000000", str(int(use_progressive)), "0.5"], inp)
        lines = out.splitlines()
        i = next(k for k, l in enumerate(lines) if l.startswith("pairs "))
        n_pairs = int(lines[i].split()[1])
        ref_pairs = {tuple(map(int, l.split()[:4]))
                     for l in lines[i + 1:i + 1 + n_pairs]}
        j = i + 1 + n_pairs
        n_chosen = int(lines[j].split()[1])
        ref_chosen = {tuple(map(int, l.split()[:2]))
                      for l in lines[j + 1:j + 1 + n_chosen]}

        p = PairwiseAlignmentParameters()
        mA = msa_aligner.make_alignment(
            state_machine5(), [SeqFrag(s) for s in seqs], 2, 10000000,
            use_progressive, 0.5, p)
        our_pairs = {(int(q["seq1"]), int(q["pos1"]), int(q["seq2"]),
                      int(q["pos2"])) for q in mA.aligned_pairs}
        our_chosen = {(s1, s2) for _sc, s1, s2 in
                      mA.chosen_pairwise_alignments}
        assert our_chosen == ref_chosen
        inter = len(ref_pairs & our_pairs)
        union = len(ref_pairs | our_pairs)
        assert union > 0 and inter / union >= 0.95, (inter, union)


def _realign_binary():
    path = os.path.join(REFPARITY_DIR, "build", "cPecanRealign")
    if not os.path.exists(path):
        subprocess.run(["make", f"REF={REF}"], cwd=REFPARITY_DIR, check=True,
                       capture_output=True)
    return path


class TestRealignCliParity:
    """Full stdin->stdout runs of the UNMODIFIED cPecanRealign.c (built
    against the shim) vs cli/realign.py, across the CLI's mode surface
    (cPecanRealign.c:350-594)."""

    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        from cpecan_tpu.utils.symbols import reverse_complement

        d = tmp_path_factory.mktemp("realign_corpus")
        rng = random.Random(1234)
        records, fasta = [], []

        def crude_cigar(c1, x, c2, y, strand2=True):
            """A deliberately-crude single-M guess; both CLIs derive
            anchors from it identically.  The line leads with the
            contig2/query fields (sonLib cigar order)."""
            m = min(len(x), len(y))
            ops = f"M {m}"
            if len(x) > m:
                ops += f" D {len(x) - m}"
            if len(y) > m:
                ops += f" I {len(y) - m}"
            if strand2:
                return f"cigar: {c2} 0 {len(y)} + {c1} 0 {len(x)} + 0 {ops}"
            return f"cigar: {c2} {len(y)} 0 - {c1} 0 {len(x)} + 0 {ops}"

        for i in range(2):
            x = get_random_sequence(rng.randint(250, 400), rng)
            y = evolve_sequence(x, rng).upper()
            fasta += [f">sx{i}\n{x}", f">sy{i}\n{y}"]
            records.append(crude_cigar(f"sx{i}", x, f"sy{i}", y))
        # minus-strand record: store revcomp so the extracted subsequence
        # aligns (cPecanRealign getSubSequence :232-240)
        x = get_random_sequence(300, rng)
        y = evolve_sequence(x, rng).upper()
        fasta += [">sxm\n" + x, ">sym\n" + reverse_complement(y)]
        records.append(crude_cigar("sxm", x, "sym", y, strand2=False))
        # ambiguity characters
        x = get_random_sequence(200, rng)
        y = evolve_sequence(x, rng).upper()
        y = y[:50] + "NNNN" + y[54:]
        fasta += [">sxn\n" + x, ">syn\n" + y]
        records.append(crude_cigar("sxn", x, "syn", y))

        fa = d / "seqs.fa"
        fa.write_text("\n".join(fasta) + "\n")
        cig = d / "in.cig"
        cig.write_text("\n".join(records) + "\n")
        return d, str(fa), cig.read_text()

    def _run_both(self, corpus, flags, tmp_path, expect_files=()):
        d, fa, cig = corpus
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PARITY_ZERO_RANDOM="1",
                   CPECAN_TPU_MSA_JITTER="0")
        out_c = subprocess.run(
            [_realign_binary()] + [f.format(side="c") for f in flags] + [fa],
            input=cig, capture_output=True, text=True, check=True,
            timeout=600, env=env, cwd=tmp_path)
        repo = os.path.join(HERE, os.pardir)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        out_py = subprocess.run(
            ["python", "-m", "cpecan_tpu.cli.realign"]
            + [f.format(side="py") for f in flags] + [fa],
            input=cig, capture_output=True, text=True, check=True,
            timeout=600, env=env, cwd=tmp_path)
        return out_c.stdout, out_py.stdout

    @staticmethod
    def _match_pairs(pa):
        """Match-op (x, y) pairs in the cigar's own coordinate frame."""
        x, y = pa.start1, pa.start2
        dx = 1 if pa.strand1 else -1
        dy = 1 if pa.strand2 else -1
        out = set()
        for op, n in pa.operations:
            if op == "M":
                out.update((x + dx * i, y + dy * i) for i in range(n))
            if op != "I":
                x += dx * n
            if op != "D":
                y += dy * n
        return out

    @classmethod
    def _compare_cigars(cls, text_c, text_py, score_tol=None):
        import io as io_mod

        from cpecan_tpu.io import cigar as cigar_io

        cigs_c = list(cigar_io.cigar_read(io_mod.StringIO(text_c)))
        cigs_py = list(cigar_io.cigar_read(io_mod.StringIO(text_py)))
        assert len(cigs_c) == len(cigs_py)
        for a, b in zip(cigs_c, cigs_py):
            assert (a.contig1, a.start1, a.end1, a.strand1) == \
                   (b.contig1, b.start1, b.end1, b.strand1)
            assert (a.contig2, a.start2, a.end2, a.strand2) == \
                   (b.contig2, b.start2, b.end2, b.strand2)
            # the engines' posteriors differ by the C logAdd's ~1e-3
            # approximation error, so near-threshold pairs may flip in
            # or out of the decoded set: require >= 98% agreement (the
            # default-flag cases do come out byte-identical in practice)
            pa, pb = cls._match_pairs(a), cls._match_pairs(b)
            union = len(pa | pb)
            assert union == 0 or len(pa & pb) / union >= 0.98, \
                (len(pa), len(pb), len(pa & pb))
            if score_tol is None:
                assert a.score == b.score
            else:
                assert a.score == pytest.approx(b.score, abs=score_tol)

    @pytest.mark.parametrize("flags,score_tol", [
        ([], None),
        (["--rescoreOriginalAlignment"], None),
        (["--rescoreByIdentity"], 1e-4),
        (["--rescoreByIdentityIgnoringGaps"], 1e-4),
        # posterior scores are on the reference's 0-100 scale; the C
        # logAdd's ~1e-3 relative error maps to ~0.1 absolute there.
        # The IgnoringGaps variant averages over the decoded set itself,
        # so near-threshold set flips move the mean further.
        (["--rescoreByPosteriorProb"], 0.1),
        (["--rescoreByPosteriorProbIgnoringGaps"], 0.3),
        (["--splitIndelsLongerThanThis", "10"], None),
        (["--diagonalExpansion", "10", "--constraintDiagonalTrim", "2"], None),
        (["--matchGamma", "0.2", "--gapGamma", "0.0"], None),
        (["--splitMatrixBiggerThanThis", "300"], None),
        (["--alignAmbiguityCharacters"], None),
    ])
    def test_mode(self, ref_bin, corpus, tmp_path, flags, score_tol):
        out_c, out_py = self._run_both(corpus, flags, tmp_path)
        self._compare_cigars(out_c, out_py, score_tol)

    def test_posterior_probs_files(self, ref_bin, corpus, tmp_path):
        flags = ["--outputPosteriorProbs", "probs_{side}.tsv"]
        out_c, out_py = self._run_both(corpus, flags, tmp_path)
        self._compare_cigars(out_c, out_py)
        ref_d, our_d = ({}, {})
        for name, d in (("probs_c.tsv", ref_d), ("probs_py.tsv", our_d)):
            for line in (tmp_path / name).read_text().splitlines():
                x, y, p = line.split("\t")
                d[(int(x), int(y))] = float(p)
        assert_pair_sets_match(ref_d, our_d, 0.5)

    def test_expectations_file(self, ref_bin, corpus, tmp_path):
        from cpecan_tpu.models.hmm import Hmm

        flags = ["--outputExpectations", "exp_{side}.txt"]
        out_c, out_py = self._run_both(corpus, flags, tmp_path)
        assert out_c.strip() == "" and out_py.strip() == ""
        h_c = Hmm.loads((tmp_path / "exp_c.txt").read_text())
        h_py = Hmm.loads((tmp_path / "exp_py.txt").read_text())
        scale = max(float(np.max(h_c.transitions)), 1.0)
        np.testing.assert_allclose(h_py.transitions, h_c.transitions,
                                   rtol=2e-2, atol=2e-3 * scale)
        e_scale = max(float(np.max(h_c.emissions)), 1.0)
        np.testing.assert_allclose(h_py.emissions, h_c.emissions,
                                   rtol=2e-2, atol=2e-3 * e_scale)
        assert h_py.likelihood == pytest.approx(h_c.likelihood, rel=1e-2)

    def test_load_hmm(self, ref_bin, corpus, tmp_path):
        from cpecan_tpu.em.em import EmOptions, make_initial_model

        opts = EmOptions()
        opts.randomStart = True
        hmm = make_initial_model(opts, random.Random(5))
        model = tmp_path / "model.txt"
        with open(model, "w") as fh:
            hmm.write(fh, precise=True)
        out_c, out_py = self._run_both(corpus, ["--loadHmm", str(model)],
                                       tmp_path)
        self._compare_cigars(out_c, out_py)


class TestEmLoopParity:
    """Full EM-loop trajectory: N iterations of (C-binary E-step over the
    corpus + our M-step) must track N iterations of our own EM pipeline
    from the same init (cPecanEm.py:166-209 drives cPecanRealign
    --outputExpectations exactly like the em_corpus mode does)."""

    @pytest.mark.parametrize("train_emissions", [False, True])
    def test_trajectory(self, ref_bin, tmp_path, train_emissions):
        from cpecan_tpu.em.em import (EmOptions, _Task, expectation_step,
                                      maximisation_step, make_initial_model)
        from cpecan_tpu.models.hmm import Hmm
        from cpecan_tpu.models.state_machine import state_machine_from_hmm

        rng = random.Random(4242)
        corpus = []
        for _ in range(6):
            x = get_random_sequence(rng.randint(80, 150), rng)
            y = evolve_sequence(x, rng).upper()
            corpus.append((x, y))

        opts = EmOptions()
        opts.trainEmissions = train_emissions
        opts.tieEmissions = train_emissions
        init = make_initial_model(opts, random.Random(7))
        p = opts.pairwise_params()
        tasks = [_Task(x, y, [], True, True) for x, y in corpus]
        inp = f"{len(corpus)}\n" + "".join(f"{x}\n{y}\n\n" for x, y in corpus)

        model_c, model_py = init, init
        likelihood_c, likelihood_py = [], []
        for iteration in range(4):
            # --- C-driven iteration
            mfile = tmp_path / f"model_c_{iteration}.txt"
            with open(mfile, "w") as fh:
                model_c.write(fh, precise=True)
            text = run_ref_raw(
                [_binary(), "em_corpus", "fiveState", "0.01", "1", "1",
                 str(mfile), str(p.diagonalExpansion),
                 str(p.splitMatrixBiggerThanThis)], inp)
            exp_c = Hmm.loads(text)
            likelihood_c.append(exp_c.likelihood)
            model_c = maximisation_step(exp_c, model_c, opts)
            # --- our iteration
            sm = state_machine_from_hmm(model_py)
            exp_py = Hmm(model_py.type, pseudo_expectation=1e-12)
            expectation_step(sm, tasks, p, exp_py)
            likelihood_py.append(exp_py.likelihood)
            model_py = maximisation_step(exp_py, model_py, opts)
            # trajectories must track at every iteration
            np.testing.assert_allclose(model_py.transitions,
                                       model_c.transitions,
                                       rtol=1e-2, atol=2e-3)
            np.testing.assert_allclose(model_py.emissions, model_c.emissions,
                                       rtol=1e-2, atol=2e-3)
        for lc, lp in zip(likelihood_c, likelihood_py):
            assert lp == pytest.approx(lc, rel=1e-2)
        # EM must not diverge: data likelihood non-decreasing-ish
        assert likelihood_py[-1] >= likelihood_py[0]
