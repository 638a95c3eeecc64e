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
