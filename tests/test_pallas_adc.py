"""Pallas ADC kernel tests.

The permutation/layout logic is validated in numpy; the kernels themselves
run in EVERY suite run — compiled by Mosaic on real TPU (REPCONC_TEST_TPU=1),
in Pallas interpret mode otherwise (pallas_adc._interpret), so kernel
correctness is never gated on hardware availability.
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


def test_kernel_parity(rng):
    """Pallas brute-force search == XLA adc_search (Mosaic on TPU, interpret elsewhere)."""
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


def test_quantize_lut_int8_roundtrip(rng):
    from repconc_tpu.index.pallas_adc import quantize_lut_int8

    Q, M, K, gm = 4, 8, 16, 8
    lut = jnp.asarray(rng.normal(size=(Q, M, K)).astype(np.float32)) * 5
    lut_perm = permute_lut(lut, gm)
    lut_i8, scales = quantize_lut_int8(lut_perm, gm, K)
    assert lut_i8.dtype == jnp.int8 and scales.shape == (Q, M // gm)
    deq = np.asarray(lut_i8).reshape(Q, M // gm, gm * K).astype(np.float32) * \
        np.asarray(scales)[:, :, None]
    orig = np.asarray(lut_perm).reshape(Q, M // gm, gm * K)
    # quantization error bounded by scale/2 per entry
    err = np.abs(deq - orig)
    bound = np.asarray(scales)[:, :, None] / 2 + 1e-6
    assert (err <= bound).all()


def test_int8_kernel_parity(rng):
    from repconc_tpu.index.adc import build_lut, score_codes
    from repconc_tpu.index.pallas_adc import (
        adc_scores_pallas_int8, quantize_lut_int8)

    M, K, DSUB = 16, 256, 4
    Q, N = 128, 1024
    queries = rng.normal(size=(Q, M * DSUB)).astype(np.float32)
    cent = rng.normal(size=(M, K, DSUB)).astype(np.float32)
    codes = jnp.asarray(rng.integers(0, K, size=(N, M)).astype(np.int32))
    gm = _group_size(M, K)
    lut = build_lut(jnp.asarray(queries), jnp.asarray(cent))
    lut_i8, scales = quantize_lut_int8(permute_lut(lut, gm), gm, K)
    s_i8 = np.asarray(adc_scores_pallas_int8(lut_i8, scales, codes, K))
    s_ref = np.asarray(score_codes(lut, codes))
    # int8 LUT quantization: small relative error, high top-k agreement
    ia = np.argsort(-s_i8, axis=1)[:, :20]
    ib = np.argsort(-s_ref, axis=1)[:, :20]
    overlap = np.mean([len(set(ia[q]) & set(ib[q])) / 20 for q in range(Q)])
    assert overlap > 0.9, overlap


def test_pallas_ivf_parity(rng):
    from repconc_tpu.index.ivf import build_ivf, search_xla
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex
    from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked

    N, D, M, K = 5000, 64, 8, 256
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:2000]), M=M, K=K, iters=5)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=2048)
    index = build_ivf(embeds, codes, cent, nlist=32, kmeans_iters=5)
    queries = embeds[:16]
    s_ref, i_ref = search_xla(index, queries, topk=10, nprobe=8)
    s_pal, i_pal = PallasIVFIndex(index).search(queries, topk=10, nprobe=8)
    overlap = np.mean([len(set(i_pal[q]) & set(i_ref[q])) / 10
                       for q in range(16)])
    assert overlap > 0.9, overlap


def test_topk_wide_matches_direct(rng):
    from repconc_tpu.index.pallas_adc import topk_wide

    for Q, N, k in ((4, 8192 * 8, 100), (3, 8192 * 8, 1000), (2, 5000, 50)):
        scores = jnp.asarray(rng.normal(size=(Q, N)).astype(np.float32))
        s1, i1 = topk_wide(scores, k)
        s2, i2 = jax.lax.top_k(scores, min(k, N))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
        # ids agree except possibly within exact ties
        same = np.asarray(s1) == np.asarray(s2)
        np.testing.assert_array_equal(np.asarray(i1)[same & (s1 == s1)],
                                      np.asarray(i2)[same & (s1 == s1)])


def test_ivf_tile_budget_and_overflow(rng):
    """The capacity-budgeted work-tile grid returns exact results when it
    fits (overflow=0, identical to the worst-case shape), reports overflow
    when forced too small, and search() transparently retries."""
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex, _tile_budget

    N, D, M, K = 3000, 32, 4, 256
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    centroids = rng.normal(size=(M, K, D // M)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    index = build_ivf(embeds, codes, centroids, nlist=16, kmeans_iters=3)
    pidx = PallasIVFIndex(index)
    queries = rng.normal(size=(8, D)).astype(np.float32)

    s_b, i_b, ov = pidx.search_device(queries, topk=10, nprobe=4)
    assert int(ov) == 0
    s_w, i_w, ov_w = pidx.search_device(queries, topk=10, nprobe=4,
                                        capacity_factor=None)
    assert int(ov_w) == 0
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_w))

    # a forced-tiny budget must REPORT the dropped tiles (never silently
    # mis-rank): queries spread over all 16 cells need ~16 tiles, budget
    # allows at most _tile_budget(...) < that
    from repconc_tpu.index.ivf import probe_cells

    q_many = rng.normal(size=(64, D)).astype(np.float32)
    n_distinct = len(np.unique(np.asarray(
        probe_cells(jnp.asarray(q_many), jnp.asarray(index.coarse_centroids),
                    4))))
    tiny_budget = _tile_budget(64, 4, 16, 0.01)
    assert n_distinct > tiny_budget  # the setup genuinely overflows
    _, _, ov_t = pidx.search_device(q_many, topk=10, nprobe=4,
                                    capacity_factor=0.01)
    assert int(ov_t) > 0

    # search() transparently retries at the worst-case shape
    s_r, i_r = pidx.search(queries, topk=10, nprobe=4)
    np.testing.assert_array_equal(i_r, np.asarray(i_w))


def test_pallas_ivf_int8_lut(rng):
    """int8-LUT IVF serving: high top-k agreement with the bf16 path (the
    quantization carries <= scale/2 per-term error; faiss's deployed config
    uses fp16 LUTs — evaluate_repconc.py:126)."""
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex

    N, D, M, K = 4000, 64, 8, 256
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    centroids = rng.normal(size=(M, K, D // M)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    index = build_ivf(embeds, codes, centroids, nlist=32, kmeans_iters=3)
    pidx = PallasIVFIndex(index)
    queries = rng.normal(size=(16, D)).astype(np.float32)

    _, i_bf = pidx.search(queries, topk=20, nprobe=8)
    _, i_i8 = pidx.search(queries, topk=20, nprobe=8, lut_dtype="int8")
    overlap = np.mean([len(set(i_i8[q]) & set(i_bf[q])) / 20
                       for q in range(16)])
    assert overlap > 0.9, overlap


def test_pallas_ivf_awkward_lpad(rng):
    """build_ivf pads lists to multiples of 128, so Lpad can be e.g. 640 —
    between L_SUB boundaries and not divisible by the scratch sub-tile.
    The kernels handle the short final sub-slice."""
    from repconc_tpu.index.ivf import IVFIndex, search_xla
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex

    D, M, K, nlist, Lpad = 32, 4, 256, 8, 640
    centroids = rng.normal(size=(M, K, D // M)).astype(np.float32)
    index = IVFIndex(
        coarse_centroids=rng.normal(size=(nlist, D)).astype(np.float32),
        cell_codes=rng.integers(0, K, size=(nlist, Lpad, M), dtype=np.uint8),
        cell_ids=np.arange(nlist * Lpad, dtype=np.int32).reshape(nlist, Lpad),
        cell_sizes=np.full(nlist, Lpad, dtype=np.int32),
        spill_codes=np.zeros((0, M), np.uint8),
        spill_ids=np.zeros((0,), np.int32),
        centroids=centroids,
    )
    queries = rng.normal(size=(8, D)).astype(np.float32)
    s_ref, i_ref = search_xla(index, queries, topk=10, nprobe=4)
    s_pal, i_pal = PallasIVFIndex(index).search(queries, topk=10, nprobe=4)
    overlap = np.mean([len(set(i_pal[q]) & set(i_ref[q])) / 10
                       for q in range(8)])
    assert overlap > 0.9, overlap
