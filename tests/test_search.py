"""Flat and ADC search exactness tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from repconc_tpu.index.flat import flat_search, batch_flat_search
from repconc_tpu.index.adc import build_lut, score_codes, adc_search, batch_adc_search
from repconc_tpu.quant.codebook import decode_gather


def test_flat_search_exact(rng):
    q = rng.normal(size=(7, 16)).astype(np.float32)
    c = rng.normal(size=(500, 16)).astype(np.float32)
    s, i = flat_search(q, c, topk=10, chunk_size=128)
    ref = q @ c.T
    ref_i = np.argsort(-ref, axis=1)[:, :10]
    np.testing.assert_allclose(s, np.take_along_axis(ref, ref_i, 1), rtol=1e-5)
    # indices may differ on ties only; scores must match
    np.testing.assert_allclose(
        np.take_along_axis(ref, i, 1), np.take_along_axis(ref, ref_i, 1), rtol=1e-5)


def test_flat_search_topk_larger_than_corpus(rng):
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    s, i = flat_search(q, c, topk=100)
    assert s.shape == (3, 5)


def test_batch_flat_search_ids(rng):
    q = rng.normal(size=(5, 8)).astype(np.float32)
    c = rng.normal(size=(50, 8)).astype(np.float32)
    corpus_ids = np.array([f"d{i}" for i in range(50)])
    s, ids = batch_flat_search(np.arange(5), q, corpus_ids, c, topk=3, batch_size=2)
    assert ids.shape == (5, 3)
    best = (q @ c.T).argmax(1)
    np.testing.assert_array_equal(ids[:, 0], corpus_ids[best])


def test_lut_scores_match_decode_dot(rng):
    """ADC invariant: score == <q, decode(codes)> exactly."""
    Q, N, M, K, dsub = 4, 100, 8, 16, 4
    q = rng.normal(size=(Q, M * dsub)).astype(np.float32)
    cent = rng.normal(size=(M, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.int32)

    lut = build_lut(jnp.asarray(q), jnp.asarray(cent))
    scores = np.asarray(score_codes(lut, jnp.asarray(codes)))

    rec = np.asarray(decode_gather(jnp.asarray(codes), jnp.asarray(cent)))
    expected = q @ rec.T
    np.testing.assert_allclose(scores, expected, rtol=1e-4, atol=1e-4)


def test_adc_search_matches_bruteforce(rng):
    Q, N, M, K, dsub = 5, 1000, 4, 16, 8
    q = rng.normal(size=(Q, M * dsub)).astype(np.float32)
    cent = rng.normal(size=(M, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)

    s, i = adc_search(q, codes, cent, topk=20, chunk_size=128)
    rec = np.asarray(decode_gather(jnp.asarray(codes.astype(np.int32)),
                                   jnp.asarray(cent)))
    ref = q @ rec.T
    ref_sorted = -np.sort(-ref, axis=1)[:, :20]
    np.testing.assert_allclose(s, ref_sorted, rtol=1e-4, atol=1e-4)


def test_batch_adc_search(rng):
    Q, N, M, K, dsub = 6, 300, 4, 16, 8
    q = rng.normal(size=(Q, M * dsub)).astype(np.float32)
    cent = rng.normal(size=(M, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    corpus_ids = np.array([f"d{i}" for i in range(N)])
    s, ids = batch_adc_search(np.arange(Q), q, corpus_ids, codes, cent,
                              topk=5, batch_size=4)
    assert s.shape == (6, 5) and ids.shape == (6, 5)
    assert (s[:, :-1] >= s[:, 1:]).all()  # sorted descending
