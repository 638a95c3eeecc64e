"""Parity tests: Pallas wavefront kernels vs the scan engine oracle.

The wavefront kernels (ops/fb_wavefront.py) implement the identical
scaled-probability recurrence as ops/fb.py, so the scan engine serves as
the numerical oracle. On the CPU test backend the kernels execute in
Pallas interpreter mode — the same kernel code path that Mosaic compiles
on TPU.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cpecan_tpu.models.state_machine import state_machine3, state_machine5
from cpecan_tpu.ops import fb_batch, fb_wavefront
from cpecan_tpu.ops.band import construct_band, full_band, pad_band
from cpecan_tpu.utils.symbols import encode


def _random_batch(rng, B=3, P=64, W=32, n=24):
    sxs, sys_, offs, wids, lxs, lys = [], [], [], [], [], []
    for i in range(B):
        nx = int(n + rng.integers(-4, 4))
        ny = int(n + rng.integers(-4, 4))
        sx = np.zeros(P, np.int32)
        sy = np.zeros(P, np.int32)
        qx = "".join("ACGTN"[j] for j in rng.integers(0, 5, nx))
        qy = "".join("ACGT"[j] for j in rng.integers(0, 4, ny))
        sx[:nx] = encode(qx)
        sy[:ny] = encode(qy)
        if i == 0:
            band = full_band(nx, ny)
        else:
            anchors = [(k, min(k, ny - 2))
                       for k in range(4, min(nx, ny) - 4, 6)]
            band = construct_band(anchors, nx, ny, 6)
        o, w, L = pad_band(band, P, W)
        sxs.append(sx)
        sys_.append(sy)
        offs.append(o)
        wids.append(w)
        lxs.append(nx)
        lys.append(ny)
    return (np.stack(sxs), np.stack(sys_), np.stack(offs), np.stack(wids),
            np.asarray(lxs, np.int32), np.asarray(lys, np.int32))


@pytest.mark.parametrize("sm_factory,mode", [
    (state_machine5, "forward"),
    (state_machine5, "posterior_all"),
    (state_machine3, "posterior_match"),
    (state_machine5, "expectation"),
    (state_machine3, "expectation"),
])
def test_wavefront_matches_scan_engine(sm_factory, mode):
    rng = np.random.default_rng(42)
    W = 32
    args = _random_batch(rng, W=W)
    rl = np.array([False, True, False])
    rr = np.array([False, False, True])
    params = sm_factory().device_params()

    ref = fb_batch.fb_pass_batch_scan(
        params, *[jnp.asarray(a) for a in args], jnp.asarray(rl),
        jnp.asarray(rr), mode=mode, width=W)
    new = fb_wavefront.fb_pass_batch_wavefront(
        params, *args, rl, rr, mode=mode, width=W)

    np.testing.assert_allclose(np.asarray(new["log_fwd"]),
                               np.asarray(ref["log_fwd"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new["mf"]), np.asarray(ref["mf"]),
                               rtol=1e-4, atol=2e-5)
    keys = ()
    if mode == "posterior_match":
        keys = ("post_match",)
    elif mode == "posterior_all":
        keys = ("post_match", "post_gap_x", "post_gap_y")
    for k in keys:
        np.testing.assert_allclose(np.asarray(new[k]), np.asarray(ref[k]),
                                   rtol=1e-3, atol=2e-5)
    if mode == "expectation":
        np.testing.assert_allclose(np.asarray(new["trans"]),
                                   np.asarray(ref["trans"]),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new["emis"]),
                                   np.asarray(ref["emis"]),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new["mb"]),
                                   np.asarray(ref["mb"]),
                                   rtol=1e-4, atol=2e-5)
        lx, ly = args[4], args[5]
        for i in range(len(lx)):
            L = int(lx[i] + ly[i])
            np.testing.assert_allclose(
                np.asarray(new["total_raw"])[i, 1:L + 1],
                np.asarray(ref["total_raw"])[i, 1:L + 1],
                rtol=1e-4, atol=2e-5)


def test_wavefront_nonzero_transitions():
    t5 = np.asarray(state_machine5().device_params()["t"])
    nz5 = fb_wavefront.nonzero_transitions(t5)
    assert len(nz5) == 13  # the reference's 13 active 5-state transitions
    t3 = np.asarray(state_machine3().device_params()["t"])
    nz3 = fb_wavefront.nonzero_transitions(t3)
    assert len(nz3) == 9
    # middle-class transitions land only in the match state (the bridge
    # restructuring in the kernels relies on this)
    assert all(t == 0 for c, f, t in nz5 if c == 1)
    assert all(t == 0 for c, f, t in nz3 if c == 1)


def test_dispatch_scan_on_cpu():
    # On the CPU test backend "auto" must pick the scan engine
    import os
    assert os.environ.get("CPECAN_TPU_ENGINE", "auto") != "wavefront"
    params = state_machine5().device_params()
    sx = jnp.zeros((2, 8), jnp.int32)
    assert fb_batch._select_engine(
        params, sx, "expectation", None, None) == "scan"


def test_pick_tiles_envelope():
    """(group, chunk) stay inside the active VMEM envelope counting the
    128-lane padding of narrow bands, and shrink for the expectation
    kernel's per-group accumulators."""
    from cpecan_tpu.ops.fb_wavefront import pick_tiles, _envelope
    for W in (8, 32, 64, 128, 256, 512):
        for B in (1, 7, 64, 256, 1000):
            for mode in ("posterior_match", "expectation", "forward"):
                g, c = pick_tiles(B, W, 2048, 5, mode)
                assert g * c * max(W, 128) <= _envelope(), (W, B, mode, g, c)
                # the expectation kernel's half-chunk halo indexing needs
                # chunk % 8; the posterior/forward grids only need the
                # NORM_EVERY schedule alignment (commit 14f61e4)
                q = 8 if mode == "expectation" else 4
                assert c % q == 0 and c >= q, (W, B, mode, g, c)
                assert g >= 1 and (g & (g - 1)) == 0
                if mode == "expectation":
                    assert g <= 64


def test_shrink_tiles_heals_and_records(tmp_path, monkeypatch):
    """A VMEM compile OOM shrinks (group, chunk) step by step down to the
    (8, 8) floor, lowering the in-memory envelope; only confirm_tiles
    (called after the shrunk config actually compiled) persists it, so a
    transient OOM cannot permanently throttle the device kind."""
    from cpecan_tpu.ops import fb_wavefront as wf

    monkeypatch.setenv("CPECAN_TPU_TILE_CACHE",
                       str(tmp_path / "tiles.json"))
    wf._envelope_live.clear()
    try:
        g, c = 128, 64
        seen = []
        while True:
            nxt = wf.shrink_tiles(g, c, 128)
            if nxt is None:
                break
            g, c = nxt
            seen.append((g, c))
            assert wf._envelope() == g * c * 128
        assert (g, c) == (8, 8)
        assert len(seen) >= 6  # chunk halves first, then group
        # un-confirmed shrinks do NOT persist: fresh state reloads default
        wf._envelope_live.clear()
        assert wf._envelope() == wf._ENVELOPE_DEFAULT
        # confirmed shrinks persist and constrain later pick_tiles
        wf.confirm_tiles(8, 8, 128)
        wf._envelope_live.clear()
        assert wf._envelope() == 8 * 8 * 128
        g2, c2 = wf.pick_tiles(256, 128, 2048, 5, "posterior_match")
        assert g2 * c2 * 128 <= 8 * 8 * 128
    finally:
        wf._envelope_live.clear()


@pytest.mark.parametrize("mode", ["posterior_match", "expectation"])
def test_batch_slicing_matches_unsliced(monkeypatch, mode):
    """When the whole-batch F_all intermediate would exceed the HBM
    budget, the dispatcher runs the batch in group-aligned slices;
    outputs must match the unsliced call exactly (same kernel, same
    shapes per slice)."""
    rng = np.random.default_rng(7)
    B = 6
    args = _random_batch(rng, B=B, W=32)
    rl = np.zeros(B, bool)
    rr = np.zeros(B, bool)
    params = state_machine5().device_params()

    whole = fb_wavefront.fb_pass_batch_wavefront(
        params, *args, rl, rr, mode=mode, width=32)
    # budget of one pair's F_all: forces per-group slices
    monkeypatch.setattr(fb_wavefront, "_F_ALL_BUDGET",
                        (args[2].shape[1] + 64) * 5 * 32 * 4)
    sliced = fb_wavefront.fb_pass_batch_wavefront(
        params, *args, rl, rr, mode=mode, width=32)

    for k in whole:
        np.testing.assert_allclose(np.asarray(sliced[k]),
                                   np.asarray(whole[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
