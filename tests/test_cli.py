"""End-to-end CLI tests (the cPecanRealignTest.py patterns): realign a
cigar stream, check coverage/rescoring/split semantics."""

import io
import random

import numpy as np
import pytest

from cpecan_tpu.cli import realign as realign_cli
from cpecan_tpu.cli import align as align_cli
from cpecan_tpu.io import cigar as cigar_io
from cpecan_tpu.utils.symbols import get_random_sequence, evolve_sequence


def write_fasta(path, seqs):
    with open(path, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name}\n{seq}\n")


def identity_cigar(name1, name2, l1, l2):
    """A crude all-match-ish cigar used as the input alignment."""
    m = min(l1, l2)
    ops = [(cigar_io.MATCH, m)]
    if l1 > m:
        ops.append((cigar_io.INDEL_X, l1 - m))
    if l2 > m:
        ops.append((cigar_io.INDEL_Y, l2 - m))
    return cigar_io.PairwiseAlignment(name1, 0, l1, True, name2, 0, l2, True, 0.0, ops)


@pytest.fixture
def seq_pair(tmp_path):
    rng = random.Random(17)
    x = get_random_sequence(80, rng).upper()
    y = evolve_sequence(x, rng).upper()
    fasta = tmp_path / "seqs.fa"
    write_fasta(fasta, {"seqX": x, "seqY": y})
    return str(fasta), x, y


def run_realign(fasta, cigars, *args):
    stdin = io.StringIO("".join(cigar_io.cigar_format(c) + "\n" for c in cigars))
    stdout = io.StringIO()
    rc = realign_cli.main([fasta, *args], stdin=stdin, stdout=stdout)
    assert rc == 0
    stdout.seek(0)
    return list(cigar_io.cigar_read(stdout))


class TestRealign:
    def test_realign_covers_same_subsequences(self, seq_pair):
        """Realigned cigars cover the same subsequences as the input
        (cPecanRealignTest.py:33-43)."""
        fasta, x, y = seq_pair
        pa = identity_cigar("seqX", "seqY", len(x), len(y))
        out = run_realign(fasta, [pa])
        assert len(out) == 1
        r = out[0]
        assert (r.start1, r.end1, r.strand1) == (0, len(x), True)
        assert (r.start2, r.end2, r.strand2) == (0, len(y), True)
        r.check()

    def test_mea_decode(self, seq_pair):
        """--mea decodes via MEA + left-shift and still covers the input
        subsequences with a valid cigar."""
        fasta, x, y = seq_pair
        pa = identity_cigar("seqX", "seqY", len(x), len(y))
        out = run_realign(fasta, [pa], "--mea")
        assert len(out) == 1
        r = out[0]
        assert (r.start1, r.end1, r.strand1) == (0, len(x), True)
        assert (r.start2, r.end2, r.strand2) == (0, len(y), True)
        r.check()
        assert any(op == cigar_io.MATCH for op, _n in r.operations)

    def test_rescore_original_alignment_preserves_alignment(self, seq_pair):
        """--rescoreOriginalAlignment outputs the same alignment
        (cPecanRealignTest.py:20-31)."""
        fasta, x, y = seq_pair
        pa = identity_cigar("seqX", "seqY", len(x), len(y))
        out = run_realign(fasta, [pa], "--rescoreOriginalAlignment")
        assert len(out) == 1
        assert out[0].operations == pa.operations

    def test_rescore_modes_in_range(self, seq_pair):
        """Rescore modes give scores in [0, 100]
        (cPecanRealignTest.py:75-99)."""
        fasta, x, y = seq_pair
        pa = identity_cigar("seqX", "seqY", len(x), len(y))
        for flag in ("--rescoreByIdentity", "--rescoreByPosteriorProb",
                     "--rescoreByIdentityIgnoringGaps",
                     "--rescoreByPosteriorProbIgnoringGaps"):
            out = run_realign(fasta, [pa], flag)
            assert 0.0 <= out[0].score <= 100.001, flag

    def test_minus_strand(self, tmp_path):
        """Minus-strand cigars realign on the reverse complement."""
        from cpecan_tpu.utils.symbols import reverse_complement
        rng = random.Random(23)
        x = get_random_sequence(60, rng).upper()
        y_f = evolve_sequence(x, rng).upper() or "ACGT"
        y = reverse_complement(y_f)
        fasta = tmp_path / "seqs.fa"
        write_fasta(fasta, {"seqX": x, "seqY": y})
        ops = [(cigar_io.MATCH, min(len(x), len(y_f)))]
        if len(x) > len(y_f):
            ops.append((cigar_io.INDEL_X, len(x) - len(y_f)))
        elif len(y_f) > len(x):
            ops.append((cigar_io.INDEL_Y, len(y_f) - len(x)))
        pa = cigar_io.PairwiseAlignment(
            "seqX", 0, len(x), True, "seqY", len(y), 0, False, 0.0, ops)
        pa.check()
        out = run_realign(str(fasta), [pa])
        assert len(out) == 1
        r = out[0]
        assert not r.strand2 and r.start2 == len(y) and r.end2 == 0
        r.check()

    def test_split_indels(self, tmp_path):
        """--splitIndelsLongerThanThis splits at long indels, preserving
        match coverage (cPecanRealignTest.py:45-73)."""
        rng = random.Random(5)
        core1 = "".join(rng.choice("ACGT") for _ in range(40))
        core2 = "".join(rng.choice("ACGT") for _ in range(40))
        x = core1 + core2
        y = core1 + "".join(rng.choice("ACGT") for _ in range(25)) + core2
        fasta = tmp_path / "seqs.fa"
        write_fasta(fasta, {"seqX": x, "seqY": y})
        pa = cigar_io.PairwiseAlignment(
            "seqX", 0, len(x), True, "seqY", 0, len(y), True, 0.0,
            [(cigar_io.MATCH, 40), (cigar_io.INDEL_Y, 25), (cigar_io.MATCH, 40)])
        out_unsplit = run_realign(str(fasta), [pa])
        out_split = run_realign(str(fasta), [pa], "--splitIndelsLongerThanThis", "10")
        # splitting yields >= as many alignments, none with long indel runs
        assert len(out_split) >= len(out_unsplit)
        for r in out_split:
            assert not realign_cli.has_long_indel(r.operations, 10)
        # match coverage preserved
        def matched(cigs):
            return sum(n for r in cigs for op, n in r.operations
                       if op == cigar_io.MATCH)
        assert matched(out_split) == matched(out_unsplit)

    def test_expectations_output(self, seq_pair, tmp_path):
        fasta, x, y = seq_pair
        from cpecan_tpu.models.hmm import Hmm
        pa = identity_cigar("seqX", "seqY", len(x), len(y))
        exp_file = str(tmp_path / "exp.txt")
        stdin = io.StringIO(cigar_io.cigar_format(pa) + "\n")
        rc = realign_cli.main(
            [fasta, "--outputExpectations", exp_file], stdin=stdin,
            stdout=io.StringIO())
        assert rc == 0
        hmm = Hmm.load(exp_file)
        assert hmm.transitions.sum() > 0
        assert hmm.likelihood != 0

    def test_posterior_probs_output(self, seq_pair, tmp_path):
        fasta, x, y = seq_pair
        pa = identity_cigar("seqX", "seqY", len(x), len(y))
        pp = str(tmp_path / "pp.tsv")
        run_realign(fasta, [pa], "--outputAllPosteriorProbs", pp)
        rows = [l.split("\t") for l in open(pp)]
        assert rows
        for xs, ys, prob in rows:
            assert 0 <= int(xs) < len(x)
            assert 0 <= int(ys) < len(y)
            assert 0.0 <= float(prob) <= 1.0


class TestAlign:
    def test_align_all_vs_all(self, tmp_path):
        rng = random.Random(7)
        t = "".join(rng.choice("ACGT") for _ in range(50))
        q = evolve_sequence(t, rng).upper() or "ACGT"
        target_fa = tmp_path / "t.fa"
        query_fa = tmp_path / "q.fa"
        write_fasta(target_fa, {"t1": t})
        write_fasta(query_fa, {"q1": q})
        stdout = io.StringIO()
        rc = align_cli.main([str(target_fa), str(query_fa)], stdout=stdout)
        assert rc == 0
        stdout.seek(0)
        out = list(cigar_io.cigar_read(stdout))
        assert len(out) == 1
        out[0].check()
        assert out[0].contig1 == "t1" and out[0].contig2 == "q1"
