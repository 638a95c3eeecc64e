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


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("CPECAN_TPU_ENGINE", None)
    return env


@pytest.mark.tpu
@pytest.mark.slow
def test_wavefront_kernels_compiled_on_tpu():
    env = _clean_env()
    probe = subprocess.run([sys.executable, "-c", _PROBE],
                           capture_output=True, text=True, timeout=300,
                           env=env, cwd=REPO)
    if "TPU_OK" not in probe.stdout:
        pytest.skip("no TPU device reachable")
    res = subprocess.run(
        [sys.executable, "-c", _KERNEL_RUN.replace("@REPO@", repr(REPO))],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ALL_KERNELS_OK" in res.stdout, res.stdout[-2000:]
