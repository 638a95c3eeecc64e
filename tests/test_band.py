"""Band construction parity with the reference's hand-computed walk
(tests/pairwiseAlignerTest.c:69-132) and structural invariants."""

import numpy as np
import pytest

from cpecan_tpu.ops.band import construct_band, full_band, pad_band


REFERENCE_WALK = [
    # (xay, xmyL, xmyR) — reference test_bands fixture, anchors
    # [(1,0),(2,1),(3,3)], lX=6, lY=5, expansion=2
    (0, 0, 0), (1, -1, 1), (2, -2, 2), (3, -1, 3), (4, -2, 4), (5, -1, 3),
    (6, -2, 4), (7, -3, 3), (8, -2, 2), (9, -1, 3), (10, 0, 2), (11, 1, 1),
]


def test_reference_band_walk():
    band = construct_band([(1, 0), (2, 1), (3, 3)], 6, 5, 2)
    for k, lo, hi in REFERENCE_WALK:
        assert int(band.offsets[k]) == lo, k
        assert int(band.offsets[k] + 2 * (band.widths[k] - 1)) == hi, k


def test_full_band_equals_unanchored():
    for lx, ly in [(4, 6), (1, 1), (10, 3), (0, 5), (5, 0)]:
        fb = full_band(lx, ly)
        cb = construct_band([], lx, ly, 2)
        np.testing.assert_array_equal(fb.offsets, cb.offsets)
        np.testing.assert_array_equal(fb.widths, cb.widths)


def test_band_invariants():
    rng = np.random.default_rng(0)
    for _ in range(20):
        lx = int(rng.integers(1, 60))
        ly = int(rng.integers(1, 60))
        n_anchor = int(rng.integers(0, min(lx, ly)))
        xs = np.sort(rng.choice(lx, size=n_anchor, replace=False))
        ys = np.sort(rng.choice(ly, size=n_anchor, replace=False))
        expansion = 2 * int(rng.integers(0, 5))
        band = construct_band(list(zip(xs, ys)), lx, ly, expansion)
        L = lx + ly
        assert len(band.offsets) == L + 1
        assert np.all(band.widths >= 1)
        # parity invariant
        ks = np.arange(L + 1)
        assert np.all((ks + band.offsets) % 2 == 0)
        # first and last diagonals are the corner cells
        assert band.offsets[0] == 0 and band.widths[0] == 1
        assert band.offsets[L] == lx - ly and band.widths[L] == 1
        # cells stay in the matrix
        x_left = (ks + band.offsets) // 2
        x_right = (ks + band.max_xmy()) // 2
        assert np.all(x_left >= 0) and np.all(x_right <= lx)
        assert np.all(ks - x_left <= ly) and np.all(ks - x_right >= 0)
        # anchors are inside the band
        for x, y in zip(xs, ys):
            k = x + 1 + y + 1
            xmy = (x + 1) - (y + 1)
            assert band.offsets[k] <= xmy <= band.max_xmy()[k]


def test_dynamic_expansion():
    band_static = construct_band([(3, 3), (8, 9)], 12, 12, 4)
    band_dyn = construct_band([(3, 3, 4), (8, 9, 4)], 12, 12, expansion=None)
    np.testing.assert_array_equal(band_static.offsets, band_dyn.offsets)
    np.testing.assert_array_equal(band_static.widths, band_dyn.widths)


def test_pad_band():
    band = construct_band([(2, 2)], 5, 5, 2)
    offsets, widths, L = pad_band(band, 16)
    assert L == 10
    assert len(offsets) == 17
    ks = np.arange(17)
    assert np.all((ks + offsets) % 2 == 0)
    assert np.all(widths[11:] == 1)
