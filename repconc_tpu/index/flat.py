"""Flat (uncompressed) inner-product search — faiss IndexFlatIP equivalent.

Reference: models/dense/evaluate_dense.py:92-129 (GPU flat index + batched
search). Here: one jitted matmul + `lax.top_k` per corpus chunk with a jitted
running top-k merge, so corpora larger than HBM stream from host while the
MXU stays busy.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


_TOPK_SUB = 8192  # width of the first-stage top-k split (see topk_wide)


def topk_wide(scores: jnp.ndarray, k: int, exact: bool = True):
    """Exact top-k over a wide score matrix via the TPU PartialReduce op.

    approx_max_k at recall_target=1.0 is exact but gets superlinearly
    expensive in k at large widths: at (1280, 131072) with k=1000 a direct
    call costs ~2.3x more than splitting the width into 8192-wide sub-blocks,
    taking an exact top-k of each, and merging (both stages exact => result
    exact). `lax.top_k` at k~1000 lowers to a full sort that can wedge the
    compiler for 10+ minutes — never used here.
    """
    Q, N = scores.shape
    k = min(k, N)
    recall = 1.0 if exact else 0.95
    nsub = N // _TOPK_SUB
    # the split only wins at genuinely wide inputs (measured: 2.3x faster at
    # 16 sub-blocks; 3.6x SLOWER at 2 sub-blocks where direct costs ~4 ms)
    if nsub < 8 or N % _TOPK_SUB or k > _TOPK_SUB // 4:
        return jax.lax.approx_max_k(scores, k, recall_target=recall)
    sub = scores.reshape(Q, nsub, _TOPK_SUB)
    s1, i1 = jax.lax.approx_max_k(sub, k, recall_target=recall)
    base = (jnp.arange(nsub, dtype=jnp.int32) * _TOPK_SUB)[None, :, None]
    i1 = (i1.astype(jnp.int32) + base).reshape(Q, nsub * k)
    s2, pos = jax.lax.approx_max_k(s1.reshape(Q, nsub * k), k,
                                   recall_target=recall)
    return s2, jnp.take_along_axis(i1, pos.astype(jnp.int32), axis=1)


@partial(jax.jit, static_argnames=("topk",))
def _chunk_topk(queries, corpus_chunk, base, topk: int):
    # HIGHEST: the dense baseline's ranking must be exact fp32 (TPU default
    # precision would route this matmul through bf16 and perturb rankings)
    scores = jnp.dot(queries, corpus_chunk.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    s, i = topk_wide(scores, min(topk, corpus_chunk.shape[0]))
    return s, i + base


@jax.jit
def _merge_topk(best_s, best_i, new_s, new_i):
    s = jnp.concatenate([best_s, new_s], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    topk = best_s.shape[1]
    ms, mpos = jax.lax.approx_max_k(s, topk, recall_target=1.0)
    return ms, jnp.take_along_axis(i, mpos.astype(jnp.int32), axis=1)


def flat_search(
    query_embeds,
    corpus_embeds,
    topk: int = 1000,
    chunk_size: int = 1 << 20,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k inner-product search.

    query_embeds: (Q, D); corpus_embeds: (N, D) (numpy host array or device
    array). Returns (scores (Q, topk), indices (Q, topk)) as numpy.
    """
    q = jnp.asarray(query_embeds, dtype=jnp.float32)
    N = corpus_embeds.shape[0]
    topk = min(topk, N)

    best_s = jnp.full((q.shape[0], topk), -jnp.inf, dtype=jnp.float32)
    best_i = jnp.zeros((q.shape[0], topk), dtype=jnp.int32)
    for start in range(0, N, chunk_size):
        stop = min(start + chunk_size, N)
        cc = jnp.asarray(corpus_embeds[start:stop], dtype=jnp.float32)
        s, i = _chunk_topk(q, cc, start, topk)
        if s.shape[1] < topk:  # tiny tail chunk
            pad = topk - s.shape[1]
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, pad)))
        best_s, best_i = _merge_topk(best_s, best_i, s, i)
    return np.asarray(best_s), np.asarray(best_i)


def fixed_query_batches(query_embeds, batch_size: int):
    """Yield (padded_chunk, n_real) with ONE static batch shape — the final
    short chunk is zero-padded. np.array_split's up-to-two distinct chunk
    shapes each cost a separate trace/compile (60-120 s per extra trace
    through the remote compiler; CLAUDE.md static-shape rule)."""
    Q = len(query_embeds)
    b = min(batch_size, Q)
    for start in range(0, Q, b):
        qc = np.asarray(query_embeds[start:start + b], dtype=np.float32)
        real = qc.shape[0]
        if real < b:
            qc = np.pad(qc, ((0, b - real), (0, 0)))
        yield qc, real


def batch_flat_search(
    query_ids: np.ndarray,
    query_embeds: np.ndarray,
    corpus_ids: np.ndarray,
    corpus_embeds,
    topk: int,
    batch_size: int = 1200,
) -> Tuple[np.ndarray, np.ndarray]:
    """Query-batched flat search returning docid strings
    (reference: evaluate_dense.py:92-110)."""
    # Pin the corpus on device once when it fits (<= ~6 GB): re-streaming it
    # per query batch costs minutes through this environment's ~10 MB/s
    # host<->device tunnel. Larger corpora keep the streaming path.
    if corpus_embeds.shape[0] * corpus_embeds.shape[1] * 4 <= 6 << 30:
        corpus_embeds = jnp.asarray(corpus_embeds, dtype=jnp.float32)
    k = min(topk, corpus_embeds.shape[0])
    if len(query_ids) == 0:
        return (np.zeros((0, k), np.float32),
                np.zeros((0, k), corpus_ids.dtype))
    all_scores, all_ids = [], []
    for q_chunk, real in fixed_query_batches(query_embeds, batch_size):
        s, i = flat_search(q_chunk, corpus_embeds, topk)
        all_scores.append(s[:real])
        all_ids.append(corpus_ids[i[:real]])
    return np.concatenate(all_scores, 0), np.concatenate(all_ids, 0)
