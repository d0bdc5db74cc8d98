"""OPQ warmup: initialize rotation + centroids from dense corpus embeddings.

Equivalent of the reference's faiss-based warmup (train/run_warmup.py:85-132)
— fit OPQ on the (subsampled) corpus embeddings, install the rotation matrix
and PQ centroids into a RepCONC model, and encode the full corpus into the
warmup index (codes + ids).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repconc_tpu.core.config import METRIC_CENTROID_COS, RepConcConfig
from repconc_tpu.index.kmeans import pq_encode_chunked
from repconc_tpu.index.opq import opq_fit, subsample_for_training
from repconc_tpu.quant import codebook

logger = logging.getLogger(__name__)


def warmup_from_embeds(
    corpus_embeds: np.ndarray,
    config: RepConcConfig,
    params: Dict[str, Any],
    max_train_points: int = 1 << 18,
    outer_iters: int = 20,
    pq_iters: int = 4,
    final_pq_iters: int = 25,
    seed: int = 2022,
    encode_chunk: int = 1 << 16,
) -> Tuple[Dict[str, Any], np.ndarray]:
    """Train OPQ, install (rotation, centroids) into params, encode corpus.

    Returns (updated params, corpus codes (N, M) uint8).
    Reference: run_warmup.py:85-132 — faiss index_factory("OPQ{M},PQ{M}x8")
    replaced by the XLA opq_fit; `index.add` replaced by chunked PQ encode.
    """
    M, K = config.MCQ_M, config.MCQ_K
    train = subsample_for_training(corpus_embeds, max_train_points, seed)
    logger.info("OPQ training on %d points (corpus %d), M=%d K=%d",
                len(train), len(corpus_embeds), M, K)
    rotation, centroids, mse = opq_fit(
        jnp.asarray(train, dtype=jnp.float32), M=M, K=K,
        outer_iters=outer_iters, pq_iters=pq_iters,
        final_pq_iters=final_pq_iters, key=jax.random.key(seed))
    logger.info("OPQ warmup reconstruction mse (sum over subspaces): %.4f",
                float(mse.sum()))

    if config.similarity_metric == METRIC_CENTROID_COS:
        centroids = codebook.normalize_centroids(centroids)

    params = dict(params)
    params["rotation"] = rotation
    params["centroids"] = centroids

    # encode the full corpus with the new codebook (rotate then assign)
    rot_np = np.asarray(rotation)
    codes = np.empty((len(corpus_embeds), M), dtype=np.uint8)
    for start in range(0, len(corpus_embeds), encode_chunk):
        stop = min(start + encode_chunk, len(corpus_embeds))
        chunk = corpus_embeds[start:stop] @ rot_np.T
        if config.similarity_metric == METRIC_CENTROID_COS:
            # host numpy: an eager jnp round-trip here would ship each
            # ~200 MB chunk through the ~10 MB/s tunnel TWICE (up for the
            # normalize, down, then up again inside pq_encode_chunked)
            sub = chunk.reshape(len(chunk), M, -1)
            norms = np.maximum(np.linalg.norm(sub, axis=-1, keepdims=True),
                               1e-12)
            chunk = (sub / norms).reshape(len(chunk), -1)
        codes[start:stop] = pq_encode_chunked(chunk, centroids, chunk=encode_chunk)
    return params, codes
