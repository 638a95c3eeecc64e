"""Parity: native C++ anchor seeder/chainer vs the numpy implementation.

Both implement the same pipeline (exact k-mer seeds -> diagonal-run merge
-> Fenwick monotone chaining); chains must match exactly on random
evolved pairs. See native/anchors.cpp and cpecan_tpu/align/anchors.py.
"""

import random

import numpy as np
import pytest

from cpecan_tpu.align import anchors, native
from cpecan_tpu.utils.symbols import evolve_sequence, get_random_sequence


def _numpy_runs(seq_x, seq_y, k, max_occ, respect_mask):
    seeds = anchors.find_seeds(seq_x, seq_y, k=k, respect_mask=respect_mask,
                               max_occ=max_occ)
    runs = anchors.merge_seeds_to_runs(seeds, k)
    return anchors.chain_runs(runs)


@pytest.mark.skipif(not native.available(),
                    reason="native anchors library unavailable")
@pytest.mark.parametrize("respect_mask", [True, False])
def test_native_matches_numpy_chains(respect_mask):
    rng = random.Random(7)
    for trial in range(8):
        n = rng.randint(200, 1200)
        seq_x = get_random_sequence(n, rng)
        seq_y = evolve_sequence(seq_x, rng)
        nat = native.chained_runs(seq_x, seq_y, 12, 32, respect_mask)
        ref = _numpy_runs(seq_x, seq_y, 12, 32, respect_mask)
        ref = np.asarray(ref, dtype=np.int64).reshape(-1, 3)
        # chains must be equally scored; with random data ties are rare so
        # require exact equality, falling back to score equality on ties
        if nat.shape == ref.shape and np.array_equal(nat, ref):
            continue
        assert nat[:, 2].sum() == ref[:, 2].sum(), (
            f"chain scores differ: native {nat[:, 2].sum()} "
            f"vs numpy {ref[:, 2].sum()}")


@pytest.mark.skipif(not native.available(),
                    reason="native anchors library unavailable")
def test_native_empty_and_short():
    assert native.chained_runs("", "", 12, 32, True).shape == (0, 3)
    assert native.chained_runs("ACGT", "ACGT", 12, 32, True).shape == (0, 3)
    # N-only sequences have no valid k-mers
    assert native.chained_runs("N" * 50, "N" * 50, 12, 32, True).shape == (0, 3)


@pytest.mark.skipif(not native.available(),
                    reason="native anchors library unavailable")
def test_native_respects_softmask():
    core = "ACGTTGCAACGGTCAGTCAA" * 4
    # fully lowercase = repeat-masked everywhere: no seeds when respected
    masked = core.lower()
    assert native.chained_runs(masked, masked, 12, 32, True).shape[0] == 0
    assert native.chained_runs(masked, masked, 12, 32, False).shape[0] > 0


def test_runs_to_anchor_pairs_vectorized():
    runs = np.array([[10, 20, 5], [100, 200, 3]], dtype=np.int64)
    got = anchors.runs_to_anchor_pairs(runs, 1, 4)
    expect = [(11, 21, 4), (12, 22, 4), (13, 23, 4), (101, 201, 4)]
    assert [tuple(map(int, r)) for r in got] == expect
    assert len(anchors.runs_to_anchor_pairs(runs, 3, 4)) == 0


def test_lastz_subprocess_parity_mode(tmp_path, monkeypatch):
    """$CPECAN_TPU_LASTZ routes anchoring through an external lastz binary
    (stubbed here) whose cigars are converted exactly like the reference's
    convertPairwiseForwardStrandAlignmentToAnchorPairs."""
    stub = tmp_path / "lastz"
    # real lastz prints the query (our Y/contig2) first on the line
    stub.write_text(
        "#!/bin/sh\n"
        "echo 'cigar: b 3 11 + a 2 12 + 57 M 4 D 2 M 4'\n")
    stub.chmod(0o755)
    monkeypatch.setenv(anchors.LASTZ_ENV, str(stub))
    got = anchors.get_blast_pairs("ACGT" * 10, "ACGT" * 10, trim=1,
                                  expansion=6, repeat_mask=True)
    # M 4 at (2,3) trimmed by 1 -> (3,4),(4,5); D 2 advances x only;
    # M 4 at (8,7) -> (9,8),(10,9); sorted by x+y
    assert [tuple(map(int, r)) for r in got] == [
        (3, 4, 6), (4, 5, 6), (9, 8, 6), (10, 9, 6)]


def test_merge_colinear_runs():
    """Same-diagonal chained runs merge into one match run spanning the
    substitutions between them (the lastz M-run analog); diagonal changes
    and over-long gaps break the merge."""
    runs = np.array([
        (10, 20, 5),    # diag -10
        (18, 28, 6),    # diag -10, gap 3 -> merged
        (30, 40, 4),    # diag -10, gap 6 -> merged
        (40, 55, 5),    # diag -15 (indel) -> new run
        (200, 215, 5),  # diag -15 but gap 155 > max -> new run
    ], dtype=np.int64)
    merged = anchors.merge_colinear_runs(runs, max_gap=64)
    assert merged.tolist() == [[10, 20, 24], [40, 55, 5], [200, 215, 5]]


def test_anchors_survive_default_trim_on_evolved_pair():
    """On a genomic-like evolved pair the bridged runs are long enough to
    survive the default constraintDiagonalTrim (14/side) — the regression
    that left 10-50 kb pairs anchorless."""
    import random as _random

    from cpecan_tpu.config import PairwiseAlignmentParameters
    from cpecan_tpu.utils.symbols import tracked_evolve

    rng = _random.Random(9)
    x = "".join(rng.choice("ACGT") for _ in range(4000))
    y, _ = tracked_evolve(x, rng)
    p = PairwiseAlignmentParameters()
    assert p.constraintDiagonalTrim == 14
    got = anchors.get_anchors(x, y, p)
    assert len(got) > 200
