"""On-chip Pallas kernel regression test.

Runs all wavefront kernel modes COMPILED (not interpreted) on a real TPU
and checks parity against the scan engine — catches Mosaic-lowering
regressions (layouts, scratch aliasing) that interpreter-mode CPU tests
cannot see and that bench.py would only surface as a perf cliff or crash.

The test suite pins the in-process backend to CPU (conftest), so the TPU
run happens in a subprocess using the environment's default platform; the
test skips when no TPU is reachable.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax
try:
    ok = any(d.platform in ("tpu", "axon") for d in jax.devices())
except Exception:
    ok = False
print("TPU_OK" if ok else "TPU_MISSING")
"""

_KERNEL_RUN = """
import sys
sys.path.insert(0, @REPO@)
from cpecan_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax
import jax.numpy as jnp
from cpecan_tpu.models.state_machine import state_machine5, state_machine3
from cpecan_tpu.ops import fb_batch, fb_wavefront
from cpecan_tpu.ops.band import construct_band, pad_band
from cpecan_tpu.utils.symbols import encode, get_random_sequence, evolve_sequence
import random

rng = random.Random(11)
P, W, B = 256, 32, 4
for sm in (state_machine5(), state_machine3()):
    params = sm.device_params()
    sx = np.zeros((B, P), np.int32); sy = np.zeros((B, P), np.int32)
    offsets = np.zeros((B, P + 1), np.int32); offsets[:, 1::2] = 1
    widths = np.ones((B, P + 1), np.int32)
    lx = np.zeros(B, np.int32); ly = np.zeros(B, np.int32)
    for i in range(B):
        x = get_random_sequence(60 + 10 * i, rng)
        y = evolve_sequence(x, rng) or "ACGTACGT"
        anchors = [(j, j) for j in range(8, min(len(x), len(y)) - 8, 16)]
        band = construct_band(anchors, len(x), len(y), 8)
        o, w, L = pad_band(band, P, W)
        offsets[i], widths[i] = o, w
        sx[i, :len(x)] = encode(x); sy[i, :len(y)] = encode(y)
        lx[i], ly[i] = len(x), len(y)
    rl = np.zeros(B, bool); rr = np.zeros(B, bool)
    args = tuple(jnp.asarray(a) for a in (sx, sy, offsets, widths, lx, ly, rl, rr))
    for mode in ("forward", "posterior_match", "posterior_all", "expectation"):
        ref = jax.device_get(fb_batch.fb_pass_batch_scan(
            params, *args, mode=mode, width=W))
        got = jax.device_get(fb_wavefront.fb_pass_batch_wavefront(
            params, *args, mode=mode, width=W, interpret=False))
        for i in range(B):
            Lr = int(lx[i] + ly[i])
            np.testing.assert_allclose(got["mf"][i, :Lr+1], ref["mf"][i, :Lr+1],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(got["log_fwd"][i], ref["log_fwd"][i],
                                       rtol=1e-4, atol=1e-4)
            for key in ("post_match", "post_gap_x", "post_gap_y"):
                if key in ref and key in got:
                    np.testing.assert_allclose(
                        got[key][i, :Lr+1], ref[key][i, :Lr+1],
                        rtol=1e-3, atol=1e-4)
        if mode == "expectation":
            np.testing.assert_allclose(got["trans"], ref["trans"],
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(got["emis"], ref["emis"],
                                       rtol=1e-3, atol=1e-4)
        print(f"{sm.type.name} {mode}: OK", flush=True)
print("ALL_KERNELS_OK")
"""


_STREAM_RUN = """
import sys
sys.path.insert(0, @REPO@)
from cpecan_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import random
import numpy as np
from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.state_machine import state_machine5
from cpecan_tpu.ops import fb_streaming
from cpecan_tpu.ops.band import construct_band
from cpecan_tpu.align.anchors import get_anchors
from cpecan_tpu.utils.symbols import encode, get_random_sequence, evolve_sequence

rng = random.Random(23)
x = get_random_sequence(1500, rng)
y = evolve_sequence(x, rng)
p = PairwiseAlignmentParameters(diagonalExpansion=8)
anchors = [(a, b) for (a, b, *_r) in get_anchors(x, y, p)]
band = construct_band(anchors, len(x), len(y), 8)
W = max(8, band.frame_width())
sm = state_machine5()

def run(engine, mode):
    out = fb_streaming.fb_pass_streaming(
        sm.device_params(), encode(x), encode(y), band.offsets, band.widths,
        len(x), len(y), False, False, mode, W, 128, engine=engine,
        threshold=0.01)
    assert fb_streaming.LAST_ENGINE == (
        "wavefront" if engine == "wavefront" else engine), fb_streaming.LAST_ENGINE
    return out

def entries(out, key):
    vals, ks, js = out["post_entries"][key]
    order = np.lexsort((js, ks))
    return vals[order], ks[order], js[order]

for mode in ("forward", "posterior_match", "posterior_all", "expectation"):
    ref = run("scan", mode)
    engines = ["wavefront"]
    if mode in ("posterior_match", "posterior_all"):
        engines.append("parallel")
    for engine in engines:
        got = run(engine, mode)
        L = len(x) + len(y)
        if "log_fwd" in got:  # parallel is decode-only by contract
            lf_ref = float(ref["log_fwd"]) + float(np.sum(ref["mf"][:L+1], dtype=np.float64))
            lf_got = float(got["log_fwd"]) + float(np.sum(got["mf"][:L+1], dtype=np.float64))
            assert abs(lf_got - lf_ref) < 1e-3 + 1e-6 * abs(lf_ref), (engine, mode, lf_ref, lf_got)
        if mode in ("posterior_match", "posterior_all"):
            keys = ["post_match"] if mode == "posterior_match" else [
                "post_match", "post_gap_x", "post_gap_y"]
            for key in keys:
                v_r, k_r, j_r = entries(ref, key)
                v_g, k_g, j_g = entries(got, key)
                # engines may disagree on sub-threshold stragglers; compare on
                # the shared support and bound one-sided entries near threshold
                ref_map = {(int(a), int(b)): float(v) for v, a, b in zip(v_r, k_r, j_r)}
                got_map = {(int(a), int(b)): float(v) for v, a, b in zip(v_g, k_g, j_g)}
                shared = set(ref_map) & set(got_map)
                assert shared, (engine, mode, key)
                md = max(abs(ref_map[s] - got_map[s]) for s in shared)
                assert md < 5e-3, (engine, mode, key, md)
                for s in set(ref_map) ^ set(got_map):
                    v = ref_map.get(s, got_map.get(s))
                    assert v < 0.03, (engine, mode, key, s, v)
        if mode == "expectation":
            np.testing.assert_allclose(got["trans"], ref["trans"], rtol=2e-3,
                                       atol=1e-5)
            np.testing.assert_allclose(got["emis"], ref["emis"], rtol=2e-3,
                                       atol=1e-5)
        print(f"{engine} {mode}: OK", flush=True)
print("ALL_STREAM_ENGINES_OK")
"""


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("CPECAN_TPU_ENGINE", None)
    env.pop("CPECAN_TPU_STREAM_ENGINE", None)
    return env


@pytest.mark.tpu
@pytest.mark.slow
def test_wavefront_kernels_compiled_on_tpu():
    env = _clean_env()
    try:
        probe = subprocess.run([sys.executable, "-c", _PROBE],
                               capture_output=True, text=True, timeout=300,
                               env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        pytest.skip("no TPU device reachable (probe timed out: hung tunnel)")
    if "TPU_OK" not in probe.stdout:
        pytest.skip("no TPU device reachable")
    res = subprocess.run(
        [sys.executable, "-c", _KERNEL_RUN.replace("@REPO@", repr(REPO))],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ALL_KERNELS_OK" in res.stdout, res.stdout[-2000:]


@pytest.mark.tpu
@pytest.mark.slow
def test_streaming_engines_compiled_on_tpu():
    """Segmented + parallel-window engines COMPILED on TPU vs the scan
    streaming engine — the dispatch routes a real TPU long pair takes
    (ops/fb_streaming.py:253-270).  Closes the blind spot that let the
    round-2/3 Mosaic regressions reach the bench."""
    env = _clean_env()
    try:
        probe = subprocess.run([sys.executable, "-c", _PROBE],
                               capture_output=True, text=True, timeout=300,
                               env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        pytest.skip("no TPU device reachable (probe timed out: hung tunnel)")
    if "TPU_OK" not in probe.stdout:
        pytest.skip("no TPU device reachable")
    res = subprocess.run(
        [sys.executable, "-c", _STREAM_RUN.replace("@REPO@", repr(REPO))],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ALL_STREAM_ENGINES_OK" in res.stdout, res.stdout[-2000:]
