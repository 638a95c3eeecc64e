"""DNA alphabet encoding and test-sequence generators.

Behavioral parity targets:
  - symbol codes {a,c,g,t,n} = 0..4 (reference inc/stateMachine.h:13-22)
  - char<->symbol conversion (reference impl/pairwiseAligner.c:317-349)
  - random/evolved sequence generators (reference impl/randomSequences.c)

TPU-first design note: sequences are encoded once on the host into dense
int8 numpy arrays; all device code consumes integer symbol tensors, never
strings.
"""

from __future__ import annotations

import random

import numpy as np

SYMBOL_NUMBER = 5
SYMBOL_NUMBER_NO_N = 4

A, C, G, T, N = 0, 1, 2, 3, 4

_CHAR_TO_SYMBOL = np.full(256, N, dtype=np.int8)
for _chars, _code in (("Aa", A), ("Cc", C), ("Gg", G), ("Tt", T)):
    for _ch in _chars:
        _CHAR_TO_SYMBOL[ord(_ch)] = _code

_SYMBOL_TO_CHAR = np.frombuffer(b"ACGTN", dtype=np.int8)


def encode(sequence: str) -> np.ndarray:
    """Encode a DNA string to an int8 symbol array (unknown chars -> N)."""
    raw = np.frombuffer(sequence.encode("latin-1"), dtype=np.uint8)
    return _CHAR_TO_SYMBOL[raw]


def decode(symbols: np.ndarray) -> str:
    return _SYMBOL_TO_CHAR[np.asarray(symbols, dtype=np.int64)].tobytes().decode("ascii")


_COMPLEMENT = {"A": "T", "T": "A", "C": "G", "G": "C", "a": "t", "t": "a",
               "c": "g", "g": "c"}


def reverse_complement(sequence: str) -> str:
    """Reverse complement preserving case; non-ACGT chars map to N."""
    return "".join(_COMPLEMENT.get(ch, "N") for ch in reversed(sequence))


def get_random_sequence(length: int, rng: random.Random | None = None) -> str:
    """Random DNA with ~1/11 N chars and mixed case.

    Mirrors the reference test-data generator (impl/randomSequences.c:13-45):
    each position is chosen from {A,C,G,T}*2 cases + {N,n} with N having
    weight 1 of 11 total (the reference picks char class uniformly from
    aAcCgGtTNn-ish distribution with p(N) ~ 1/11).
    """
    rng = rng or random
    chars = "AaCcGgTt" + "Nn"
    # 8 case-variant ACGT chars weighted 10/11 total, N/n weighted 1/11
    out = []
    for _ in range(length):
        if rng.random() < 1.0 / 11.0:
            out.append("Nn"[rng.random() < 0.5])
        else:
            out.append(chars[int(rng.random() * 8)])
    return "".join(out)


def evolve_sequence(sequence: str, rng: random.Random | None = None) -> str:
    """Mutate a sequence: ~20% substitutions plus random short indels.

    Mirrors reference impl/randomSequences.c:50-73: walks the input, each
    base deleted with p=0.1, duplicated-with-insertion with p=0.1, and
    substituted with p=0.2.
    """
    rng = rng or random
    out = []
    bases = "ACGTacgt"
    for ch in sequence:
        r = rng.random()
        if r < 0.1:
            continue  # deletion
        if r < 0.2:
            out.append(bases[int(rng.random() * 8)])  # insertion
        if rng.random() < 0.2:
            out.append(bases[int(rng.random() * 8)])  # substitution
        else:
            out.append(ch)
    return "".join(out)


def tracked_evolve(sequence: str, rng: random.Random | None = None,
                   sub_rate: float = 0.1, indel_rate: float = 0.02,
                   max_indel: int = 5):
    """Evolve a sequence with substitutions and short indels, returning
    (mutant, true_pairs) where true_pairs is the exact list of (x, y)
    aligned (possibly substituted) base pairs — a planted-truth generator
    for accuracy tests and benchmarks (the repo-local stand-in for the
    reference long test's curated ENCODE alignments,
    tests/pairwiseAlignerLongTest.c:40-121)."""
    rng = rng or random
    out = []
    true_pairs = []
    y = 0
    x = 0
    n = len(sequence)
    while x < n:
        r = rng.random()
        if r < indel_rate:  # deletion: skip input bases
            x += rng.randint(1, max_indel)
            continue
        if r < 2 * indel_rate:  # insertion: emit random bases
            ins = rng.randint(1, max_indel)
            out.extend(rng.choice("ACGT") for _ in range(ins))
            y += ins
            continue
        c = sequence[x]
        if rng.random() < sub_rate:
            c = rng.choice("ACGT")
        out.append(c)
        true_pairs.append((x, y))
        x += 1
        y += 1
    return "".join(out), true_pairs
