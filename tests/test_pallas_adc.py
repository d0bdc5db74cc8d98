"""Pallas ADC kernel tests.

The permutation/layout logic is validated on CPU; the kernel itself needs
real TPU hardware (Mosaic ops) and runs only with REPCONC_TEST_TPU=1.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from repconc_tpu.index.adc import build_lut
from repconc_tpu.index.pallas_adc import permute_lut, _group_size

ON_TPU = os.environ.get("REPCONC_TEST_TPU") == "1"


def test_group_size():
    assert _group_size(48, 256) == 8
    assert _group_size(4, 256) == 4
    assert _group_size(8, 16) == 8
    with pytest.raises(ValueError):
        _group_size(3, 16)  # 3*16=48 not a multiple of 128 and no divisor fits


def test_permute_lut_layout(rng):
    Q, M, K, gm = 2, 8, 16, 8
    lut = jnp.asarray(rng.normal(size=(Q, M, K)).astype(np.float32))
    out = np.asarray(permute_lut(lut, gm))
    lut_np = np.asarray(lut)
    # lane l in group g holds lut[q, g*gm + l%gm, l//gm]
    lanes = gm * K
    for q in range(Q):
        for g in range(M // gm):
            for l in range(0, lanes, 37):
                m = g * gm + l % gm
                k = l // gm
                assert out[q, g * lanes + l] == lut_np[q, m, k]


def test_onehot_contraction_equivalence(rng):
    """The kernel's math, checked in pure numpy: grouped one-hot contraction
    against the permuted LUT == direct LUT accumulation."""
    Q, M, K, N = 3, 8, 16, 10
    gm = _group_size(M, K)
    lut = rng.normal(size=(Q, M, K)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M))

    direct = np.zeros((Q, N))
    for n in range(N):
        for m in range(M):
            direct[:, n] += lut[:, m, codes[n, m]]

    lut_perm = np.asarray(permute_lut(jnp.asarray(lut), gm))
    lanes = gm * K
    scores = np.zeros((Q, N))
    for g in range(M // gm):
        cols = codes[:, g * gm:(g + 1) * gm]           # (N, gm)
        expanded = np.tile(cols, (1, K))               # concat semantics
        k_of_lane = np.arange(lanes)[None, :] // gm
        onehot = (expanded == k_of_lane).astype(np.float32)
        scores += lut_perm[:, g * lanes:(g + 1) * lanes] @ onehot.T
    np.testing.assert_allclose(scores, direct, rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU (Mosaic kernel)")
def test_kernel_on_tpu(rng):
    from repconc_tpu.index.adc import adc_search
    from repconc_tpu.index.pallas_adc import PallasADCIndex

    M, K, DSUB = 16, 256, 4
    Q, N = 32, 2048
    queries = rng.normal(size=(Q, M * DSUB)).astype(np.float32)
    cent = rng.normal(size=(M, K, DSUB)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)

    s1, i1 = PallasADCIndex(codes, cent).search(queries, topk=20)
    s2, i2 = adc_search(queries, codes, cent, topk=20)
    overlap = np.mean([len(set(i1[q]) & set(i2[q])) / 20 for q in range(Q)])
    assert overlap > 0.95, overlap
