"""Device-side sparse compaction of thresholded posterior blocks.

`jnp.nonzero` on TPU lowers to a sort-based compaction — ~400 ms on a
48M-element block, dwarfing the DP kernels it post-processes. Posterior
rows are physically sparse (a diagonal's posteriors sum to ~1 per kind,
so >= 0.01 entries per row are few), which admits a cheap two-stage
scheme:

  1. per-row rank selection: rank in-row hits by cumsum and pull the
     first KE of each row into (R, KE) slots with KE masked reductions —
     pure vectorized multiply-adds, no sort, no gather;
  2. one small nonzero over the (R * KE) slot mask (KE/W of the
     original size) to pack the slots into a flat entry list.

Rows holding more than KE hits are reported via the returned per-row
maximum so the caller can escalate (re-run with the exact sort-based
path) — with production thresholds this never fires.
"""

from __future__ import annotations

import jax.numpy as jnp

# First-stage slots per row: comfortably above typical >= 0.01 posterior
# hits per diagonal (a few), small enough that stage 2 is ~KE/W of the
# block.
DEFAULT_SLOTS = 16


def compact_rows(win, thr, cap: int, ke: int = DEFAULT_SLOTS):
    """Compact entries >= thr of a (R, W) block into a flat entry list.

    Returns (idx, vals, count, row_max):
      idx:  (cap,) int32, row * W + j of each entry, -1 padded;
      vals: (cap,) matching values;
      count: total number of >= thr entries in the block;
      row_max: max per-row hit count — entries are EXACT iff
        row_max <= ke and count <= cap, else the caller must escalate
        (compact_rows_exact).
    """
    R, W = win.shape
    hit = win >= thr
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1
    js = jnp.arange(W, dtype=jnp.int32)
    vals_s = []
    js_s = []
    for r in range(ke):
        sel = hit & (rank == r)
        vals_s.append(jnp.sum(jnp.where(sel, win, 0), axis=-1))
        js_s.append(jnp.sum(jnp.where(sel, js, 0), axis=-1))
    vals2 = jnp.stack(vals_s, axis=-1)  # (R, ke)
    j2 = jnp.stack(js_s, axis=-1)
    cnt_row = jnp.sum(hit, axis=-1)  # (R,)

    slot_hit = (jnp.arange(ke, dtype=jnp.int32)[None, :]
                < jnp.minimum(cnt_row, ke)[:, None])
    idx2 = jnp.nonzero(slot_hit.reshape(-1), size=cap, fill_value=-1)[0]
    safe = jnp.clip(idx2, 0, R * ke - 1)
    rows = safe // ke
    vals = vals2.reshape(-1)[safe]
    jsel = j2.reshape(-1)[safe]
    idx = jnp.where(idx2 >= 0, rows * W + jsel, -1)
    return (idx.astype(jnp.int32), vals,
            jnp.sum(cnt_row, dtype=jnp.int32),
            jnp.max(cnt_row).astype(jnp.int32))


def compact_rows_exact(win, thr, cap: int):
    """Sort-based exact compaction (the escalation path): same contract
    minus row_max."""
    R, W = win.shape
    flat = win.reshape(-1)
    hit = flat >= thr
    idx = jnp.nonzero(hit, size=cap, fill_value=-1)[0]
    vals = flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
    return (idx.astype(jnp.int32), vals, jnp.sum(hit, dtype=jnp.int32))
