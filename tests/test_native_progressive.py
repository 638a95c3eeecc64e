"""Parity: native progressive MSA merge (native/progressive.cpp) vs the
pure-Python implementation (msa/aligner.py) — identical column partitions
on random inputs (the Python path is the oracle; the C++ path is an exact
port including adjacency iteration order and float combine order)."""

import random

import numpy as np
import pytest

from cpecan_tpu.msa import aligner
from cpecan_tpu.msa.columns import ColumnStore


def make_case(seed, n_seqs=6, length=40, n_pairs=300):
    rng = random.Random(seed)
    frags = [aligner.SeqFrag("A" * rng.randint(length // 2, length), i, i + 1)
             for i in range(n_seqs)]
    pairs = []
    for _ in range(n_pairs):
        s1, s2 = rng.sample(range(n_seqs), 2)
        if s1 > s2:
            s1, s2 = s2, s1
        p1 = rng.randrange(frags[s1].length)
        p2 = rng.randrange(frags[s2].length)
        prob = rng.randint(1, 10_000_000)
        pairs.append((prob, s1, p1, s2, p2))
    mp = np.asarray(pairs, aligner.MULTIPLE_PAIR_DTYPE)
    scores = [(rng.random(), s1, s2) for s1 in range(n_seqs)
              for s2 in range(s1 + 1, n_seqs) if rng.random() < 0.7]
    return frags, mp, scores


def partition(store: ColumnStore):
    return tuple(store.find(p) for p in range(store.n_positions))


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python_partition(seed, monkeypatch):
    from cpecan_tpu.align import native as native_mod

    if not native_mod.available():
        pytest.skip("native library unavailable")
    frags, mp, scores = make_case(seed)
    gamma = [0.0, 0.01, 0.3][seed % 3]

    native_store = aligner._progressive_native(frags, mp, gamma, scores)
    assert native_store is not None

    monkeypatch.setenv("CPECAN_TPU_NATIVE", "0")
    py_store = aligner.get_multiple_sequence_alignment_progressive(
        frags, mp, gamma, scores)

    # identical partitions (root labels may differ; compare by grouping)
    def canon(st):
        groups = {}
        for pid in range(st.n_positions):
            groups.setdefault(st.find(pid), []).append(pid)
        return sorted(tuple(v) for v in groups.values())

    assert canon(native_store) == canon(py_store)


def test_members_rebuilt(monkeypatch):
    from cpecan_tpu.align import native as native_mod

    if not native_mod.available():
        pytest.skip("native library unavailable")
    frags, mp, scores = make_case(99)
    store = aligner._progressive_native(frags, mp, 0.0, scores)
    # members lists must cover exactly the multi-member columns
    for root, mem in store.members.items():
        assert len(mem) > 1
        assert all(store.find(p) == store.find(root) for p in mem)
    cols = store.all_columns()
    assert sum(len(v) for v in cols.values()) == store.n_positions
