"""Asymmetric distance computation (ADC) search over PQ codes.

faiss-equivalent of IndexPQ/IndexIVFPQ search with per-query lookup tables
(reference: evaluate_repconc.py:78-135,180-206). The score of doc n for
query q is

    score(q, n) = sum_m LUT[q, m, codes[n, m]],   LUT[q, m, k] = <q_m, C[m, k]>

This module is the XLA reference implementation (correct everywhere, used
for tests and small corpora); the Pallas kernel in pallas_adc.py is the
performance path on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repconc_tpu.index.flat import _merge_topk

_HIGH = jax.lax.Precision.HIGHEST


def build_lut(query_embeds: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Per-query inner-product tables. (Q, D) x (M, K, dsub) -> (Q, M, K)."""
    Q, D = query_embeds.shape
    M = centroids.shape[0]
    qs = query_embeds.reshape(Q, M, -1)
    return jnp.einsum("qmd,mkd->qmk", qs, centroids,
                      preferred_element_type=jnp.float32, precision=_HIGH)


@jax.jit
def score_codes(lut: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Score a code chunk against LUTs: (Q, M, K) x (N, M) -> (Q, N).

    A scan over the M subspaces accumulating one (N, Q) buffer — peak
    memory O(N*Q), never O(M*N*Q). XLA reference path; the Pallas kernel
    (pallas_adc.py) replaces this on the TPU serving path.
    """
    lut_t = lut.transpose(1, 2, 0)  # (M, K, Q)
    codes_t = codes.T.astype(jnp.int32)  # (M, N)

    def body(acc, mk):
        table, idx = mk  # (K, Q), (N,)
        return acc + jnp.take(table, idx, axis=0), None

    init = jnp.zeros((codes.shape[0], lut_t.shape[2]), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, init, (lut_t, codes_t))
    return acc.T


@partial(jax.jit, static_argnames=("topk",))
def _adc_chunk_topk(lut, codes_chunk, base, topk: int):
    scores = score_codes(lut, codes_chunk)
    k = min(topk, codes_chunk.shape[0])
    # exact PartialReduce top-k: lax.top_k's full sort at k~1000 can wedge
    # the remote compiler for 10+ min (CLAUDE.md); this path IS reachable
    # on TPU (batch_adc_search uses it for corpora under 20k docs)
    s, i = jax.lax.approx_max_k(scores, k, recall_target=1.0)
    return s, i.astype(jnp.int32) + base


def adc_search(
    query_embeds,
    codes,
    centroids,
    topk: int = 1000,
    chunk_size: int = 1 << 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force ADC top-k over the full code matrix.

    query_embeds: (Q, D); codes: (N, M) uint8 (host numpy or device);
    centroids: (M, K, dsub). Returns numpy (scores, indices) of shape (Q, topk).
    """
    q = jnp.asarray(query_embeds, dtype=jnp.float32)
    cent = jnp.asarray(centroids, dtype=jnp.float32)
    lut = build_lut(q, cent)
    N = codes.shape[0]
    topk = min(topk, N)

    best_s = jnp.full((q.shape[0], topk), -jnp.inf, dtype=jnp.float32)
    best_i = jnp.zeros((q.shape[0], topk), dtype=jnp.int32)
    for start in range(0, N, chunk_size):
        stop = min(start + chunk_size, N)
        # ship raw uint8 (score_codes casts on device): widening to int32
        # on the host would quadruple the bytes through the ~10 MB/s tunnel
        cc = jnp.asarray(codes[start:stop])
        s, i = _adc_chunk_topk(lut, cc, start, topk)
        if s.shape[1] < topk:
            pad = topk - s.shape[1]
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, pad)))
        best_s, best_i = _merge_topk(best_s, best_i, s, i)
    return np.asarray(best_s), np.asarray(best_i)


def batch_adc_search(
    query_ids: np.ndarray,
    query_embeds: np.ndarray,
    corpus_ids: np.ndarray,
    codes,
    centroids,
    topk: int,
    batch_size: int = 1200,
) -> Tuple[np.ndarray, np.ndarray]:
    """Query-batched ADC search returning docid strings
    (reference: evaluate_repconc.py:188-206). On TPU with a non-trivial
    corpus the Pallas device-resident index serves the batches; elsewhere
    (CPU tests) the XLA path runs."""
    searcher = None
    if jax.devices()[0].platform != "cpu" and codes.shape[0] >= 20_000:
        from repconc_tpu.index.pallas_adc import PallasADCIndex

        searcher = PallasADCIndex(codes, centroids)

    from repconc_tpu.index.flat import fixed_query_batches

    k = min(topk, codes.shape[0])
    if len(query_ids) == 0:
        return (np.zeros((0, k), np.float32),
                np.zeros((0, k), corpus_ids.dtype))
    all_scores, all_ids = [], []
    for q_chunk, real in fixed_query_batches(query_embeds, batch_size):
        if searcher is not None:
            s, i = searcher.search(q_chunk, topk=topk)
        else:
            s, i = adc_search(q_chunk, codes, centroids, topk)
        all_scores.append(s[:real])
        all_ids.append(corpus_ids[i[:real]])
    return np.concatenate(all_scores, 0), np.concatenate(all_ids, 0)
