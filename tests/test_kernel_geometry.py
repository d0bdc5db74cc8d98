"""IVF kernel geometry overrides must stay EXACT at every sweep point.

recipes/bench_kernel_sweep.py times REPCONC_IVF_QT_G x REPCONC_IVF_R_TILES
configurations on the chip, but bench.py's only in-run sanity check is the
work-tile overflow flag — a geometry bug that mis-scores WITHOUT
overflowing (e.g. the tc % r_tiles remainder leaving chunk-tail tiles
unscored, fixed in _score_work_tiles) would time beautifully and return
garbage. This test runs each sweep configuration's kernel in interpret
mode (subprocess: the knobs bind at module import) and asserts exact
score parity with the XLA IVF scan on the same index.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARITY_SCRIPT = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from repconc_tpu.index.ivf import build_ivf_from_codes, search_xla
from repconc_tpu.index.pallas_ivf import PallasIVFIndex

rng = np.random.default_rng(3)
D, M, K, N, Q, TOPK, NPROBE = 64, 8, 16, 3000, 48, 10, 4
cent = rng.normal(size=(M, K, D // M)).astype(np.float32)
codes = rng.integers(0, K, size=(N, M), dtype=np.uint8)
ivf = build_ivf_from_codes(codes, cent, nlist=16)
q = rng.normal(size=(Q, D)).astype(np.float32)

s_x, i_x = search_xla(ivf, q, topk=TOPK, nprobe=NPROBE)
s_p, i_p = PallasIVFIndex(ivf).search(q, topk=TOPK, nprobe=NPROBE)

# ids can tie-swap between implementations (random codes collide), so
# compare sorted scores and the id->score mapping, not id order. The
# kernel scores through a bf16 LUT (by design, see pallas_adc); the XLA
# scan is fp32 — tolerances sized to bf16 rounding (~0.4% relative),
# NOT to the geometry bugs this guards against (an unscored tile leaves
# whole entries at 0/-inf, off by O(100%)).
order_x = np.argsort(-np.asarray(s_x), axis=1)
order_p = np.argsort(-np.asarray(s_p), axis=1)
np.testing.assert_allclose(np.take_along_axis(np.asarray(s_p), order_p, 1),
                           np.take_along_axis(np.asarray(s_x), order_x, 1),
                           rtol=1e-2, atol=0.1)
for xs, xi, ps, pi in zip(np.asarray(s_x), np.asarray(i_x),
                          np.asarray(s_p), np.asarray(i_p)):
    ref = {int(i): float(s) for s, i in zip(xs, xi) if i >= 0}
    for s, i in zip(ps, pi):
        if i >= 0 and int(i) in ref:
            r = ref[int(i)]
            assert abs(r - float(s)) <= 0.02 * max(1.0, abs(r)), (i, s, r)
print("GEOMETRY_PARITY_OK")
"""


@pytest.mark.parametrize("qt_g,r_tiles", [(8, 1), (16, 3), (64, 2)])
def test_geometry_override_parity(qt_g, r_tiles):
    env = dict(os.environ,
               REPCONC_IVF_QT_G=str(qt_g),
               REPCONC_IVF_R_TILES=str(r_tiles),
               REPCONC_PALLAS_INTERPRET="1",
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", PARITY_SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "GEOMETRY_PARITY_OK" in out.stdout
