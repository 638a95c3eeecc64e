"""Large-gap splitting: decompose an alignment problem into independent
sub-rectangles around big anchor gaps.

Exact port of the reference semantics (getSplitPoints / ...P,
impl/pairwiseAligner.c:1206-1257): anchor gaps whose sub-matrix exceeds
splitMatrixBiggerThanThis cut the problem, capping each side near
sqrt(splitMatrixBiggerThanThis); ragged-end flags suppress the outermost
blocks only.
"""

from __future__ import annotations

import math


def get_split_points(anchor_pairs, lx: int, ly: int,
                     split_matrix_bigger_than_this: int,
                     ragged_left: bool, ragged_right: bool) -> list:
    """Returns a list of (x1, y1, x2, y2) sub-rectangles covering the
    alignment path."""
    assert lx >= 0 and ly >= 0
    split_points: list = []
    state = {"x1": 0, "y1": 0}

    def split_p(x2, y2, x3, y3, skip_block) -> bool:
        lx2, ly2 = x3 - x2, y3 - y2
        if lx2 * ly2 > split_matrix_bigger_than_this:
            max_len = int(math.sqrt(split_matrix_bigger_than_this))
            hx = min(lx2 // 2, max_len)
            hy = min(ly2 // 2, max_len)
            if not skip_block:
                split_points.append((state["x1"], state["y1"], x2 + hx, y2 + hy))
            state["x1"] = x3 - hx
            state["y1"] = y3 - hy
            return True
        return False

    x2, y2 = 0, 0
    for i, anchor in enumerate(anchor_pairs):
        x3, y3 = int(anchor[0]), int(anchor[1])
        split_p(x2, y2, x3, y3, ragged_left and i == 0)
        assert x3 >= x2 and y3 >= y2 and x3 < lx and y3 < ly
        x2, y2 = x3 + 1, y3 + 1

    if (not split_p(x2, y2, lx, ly, ragged_left and len(anchor_pairs) == 0)
            or not ragged_right):
        split_points.append((state["x1"], state["y1"], lx, ly))
    return split_points


def split_anchors(anchor_pairs, split_points):
    """Partition anchors among split rectangles, shifting into local
    coordinates (reference :1294-1308). Yields (rect, local_anchor_list)."""
    j = 0
    anchor_pairs = list(anchor_pairs)
    for i, (x1, y1, x2, y2) in enumerate(split_points):
        local = []
        while j < len(anchor_pairs):
            a = anchor_pairs[j]
            x, y = int(a[0]), int(a[1])
            assert x + y >= x1 + y1
            if x + y >= x2 + y2:
                break
            assert x1 <= x < x2 and y1 <= y < y2
            local.append((x - x1, y - y1) + tuple(a[2:]))
            j += 1
        yield (x1, y1, x2, y2), local
    assert j == len(anchor_pairs)
