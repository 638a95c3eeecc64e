"""Anchor-quality loop vs the REAL vendored lastz (SURVEY hard-part 4).

Builds the reference's vendored lastz-distrib-1.03.54 out-of-tree
(native/lastz/Makefile -> cPecanLastz, mirroring externalTools/Makefile:4-7),
points $CPECAN_TPU_LASTZ at it (align/anchors.py exact-parity mode, the
same flags as impl/pairwiseAligner.c:1032-1041), and measures our k-mer
seeder against it: anchor drift, and end-to-end planted-truth accuracy
with each anchor set feeding the same DP engines.
"""

import os
import random
import subprocess

import numpy as np
import pytest

from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.state_machine import state_machine5

HERE = os.path.dirname(os.path.abspath(__file__))
LASTZ_DIR = os.path.join(HERE, os.pardir, "native", "lastz")
REF = os.environ.get("CPECAN_TPU_REFERENCE", "/root/reference")


@pytest.fixture(scope="module")
def lastz_bin():
    src = os.path.join(REF, "externalTools", "lastz-distrib-1.03.54")
    if not os.path.isdir(src):
        pytest.skip("vendored lastz not available")
    path = os.path.join(LASTZ_DIR, "build", "cPecanLastz")
    if not os.path.exists(path):
        try:
            subprocess.run(["make", f"REF={REF}", "-j4"], cwd=LASTZ_DIR,
                           check=True, capture_output=True, timeout=600)
        except subprocess.CalledProcessError as e:  # pragma: no cover
            pytest.skip(f"could not build lastz: {e.stderr.decode()[-500:]}")
    return path


def _sens_spec(predicted, truth):
    predicted = set(predicted)
    truth = set(truth)
    tp = len(predicted & truth)
    return (tp / max(len(truth), 1), tp / max(len(predicted), 1))


def _anchor_coverage(anchors, truth):
    """Fraction of true aligned pairs within the banded expansion of any
    anchor's diagonal (is the band wide enough to recover the truth?)."""
    if len(anchors) == 0:
        return 0.0
    a = np.asarray(anchors, np.int64)
    diag = np.sort(a[:, 0] - a[:, 1])
    t = np.asarray(sorted(truth), np.int64)
    td = t[:, 0] - t[:, 1]
    idx = np.searchsorted(diag, td)
    lo = diag[np.clip(idx - 1, 0, len(diag) - 1)]
    hi = diag[np.clip(idx, 0, len(diag) - 1)]
    exp = int(a[:, 2].max()) if a.shape[1] > 2 else 20
    near = (np.abs(td - lo) <= exp) | (np.abs(td - hi) <= exp)
    return float(near.mean())


class TestLastzAnchorParity:
    @pytest.mark.slow
    def test_smoke_lastz_mode_runs(self, lastz_bin, monkeypatch):
        """The $CPECAN_TPU_LASTZ subprocess mode end-to-end on a small
        pair: anchors parse, are monotone-sorted, and feed the DP."""
        from cpecan_tpu.align import pairwise
        from cpecan_tpu.align.anchors import get_anchors
        from cpecan_tpu.utils.symbols import (evolve_sequence,
                                              get_random_sequence)

        rng = random.Random(11)
        # uppercase: lowercase is soft-masked and lastz skips it entirely
        x = get_random_sequence(3000, rng).upper()
        y = evolve_sequence(x, rng).upper()
        p = PairwiseAlignmentParameters()
        monkeypatch.setenv("CPECAN_TPU_LASTZ", lastz_bin)
        anchors = np.asarray(get_anchors(x, y, p))
        assert len(anchors) > 100
        order = anchors[:, 0] + anchors[:, 1]
        assert (np.diff(order) >= 0).all()
        pairs = pairwise.get_aligned_pairs_using_anchors(
            state_machine5(), x, y,
            [(int(a), int(b), int(e)) for a, b, e in anchors], p)
        assert len(pairs) > 1500

    @pytest.mark.slow
    def test_repeat_rich_50kb_anchor_quality(self, lastz_bin, monkeypatch):
        """The SURVEY §7 hard-part-4 risk, measured: on a repeat-rich
        soft-masked genomic-like 50 kb pair, the full pipeline driven by
        our k-mer anchors must match the same pipeline driven by REAL
        lastz anchors to within 0.01 sens/spec; anchor drift is printed
        for the record."""
        from cpecan_tpu.align.anchors import get_anchors
        from cpecan_tpu.align.pairwise import get_aligned_pairs_using_anchors
        from cpecan_tpu.msa.aligner import (
            filter_pairwise_alignment_to_make_pairs_ordered)
        from cpecan_tpu.ops import pairs as pairs_mod
        from cpecan_tpu.utils.symbols import (genomic_like_sequence,
                                              tracked_evolve)

        n = 50_000
        rng = random.Random(777)
        seq_x = genomic_like_sequence(n, rng)
        seq_y, truth = tracked_evolve(seq_x, rng, sub_rate=0.08)
        p = PairwiseAlignmentParameters()
        sm = state_machine5()

        monkeypatch.delenv("CPECAN_TPU_LASTZ", raising=False)
        anchors_kmer = np.asarray(get_anchors(seq_x, seq_y, p))
        monkeypatch.setenv("CPECAN_TPU_LASTZ", lastz_bin)
        anchors_lastz = np.asarray(get_anchors(seq_x, seq_y, p))
        monkeypatch.delenv("CPECAN_TPU_LASTZ")
        assert len(anchors_lastz) > 0, "lastz produced no anchors"

        # anchor drift record (captured in the test log)
        cov_kmer = _anchor_coverage(anchors_kmer, truth)
        cov_lastz = _anchor_coverage(anchors_lastz, truth)
        print(f"\nanchor drift: kmer n={len(anchors_kmer)} "
              f"truth-coverage={cov_kmer:.4f} | lastz n={len(anchors_lastz)} "
              f"truth-coverage={cov_lastz:.4f}")
        # our anchors must band-cover the truth at least as well as -2%
        assert cov_kmer >= cov_lastz - 0.02, (cov_kmer, cov_lastz)

        results = {}
        for name, anchors in (("kmer", anchors_kmer),
                              ("lastz", anchors_lastz)):
            pairs = get_aligned_pairs_using_anchors(
                sm, seq_x, seq_y,
                [(int(a), int(b), int(e)) for a, b, e in anchors], p)
            ordered = filter_pairwise_alignment_to_make_pairs_ordered(
                pairs_mod.sort_pairs(pairs), seq_x, seq_y, 0.9)
            results[name] = _sens_spec(
                zip(ordered["x"], ordered["y"]), truth)
        (s_k, p_k), (s_l, p_l) = results["kmer"], results["lastz"]
        print(f"pipeline: kmer sens={s_k:.4f} spec={p_k:.4f} | "
              f"lastz sens={s_l:.4f} spec={p_l:.4f}")
        assert s_k >= s_l - 0.01, f"kmer sens {s_k:.4f} vs lastz {s_l:.4f}"
        assert p_k >= p_l - 0.01, f"kmer spec {p_k:.4f} vs lastz {p_l:.4f}"
