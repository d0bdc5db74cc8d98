"""PQ codebook operations: distances, encode (argmin / Sinkhorn), decode.

Equivalent of the reference's RepCONC quantization core
(models/repconc/modeling_repconc.py:47-85,168-184), designed MXU-first:

* subspace distances use the ||x||^2 + ||c||^2 - 2 x.c expansion so the hot
  term is a batched matmul (einsum) on the MXU rather than a broadcasted
  subtract-square (which would materialize (M, B, K, dsub));
* decode is a one-hot einsum — on TPU a K-wide one-hot matmul is faster than
  a gather for training-sized batches, and its VJP w.r.t. the codebook is
  another matmul (an efficient scatter-add on the MXU).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from repconc_tpu.quant.sinkhorn import sinkhorn_assign


def subvector_view(embeds: jnp.ndarray, M: int) -> jnp.ndarray:
    """(B, D) -> (B, M, dsub)."""
    B, D = embeds.shape
    return embeds.reshape(B, M, D // M)


def pairwise_sqdist(embeds: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances per subspace.

    embeds: (B, D); centroids: (M, K, dsub). Returns (M, B, K).
    """
    M = centroids.shape[0]
    x = subvector_view(embeds, M)  # (B, M, dsub)
    x_sq = jnp.sum(x * x, axis=-1)  # (B, M)
    c_sq = jnp.sum(centroids * centroids, axis=-1)  # (M, K)
    # HIGHEST precision: argmin over distances must be exact in fp32 — the
    # TPU default would route this matmul through bf16 and flip assignments.
    xc = jnp.einsum("bmd,mkd->bmk", x, centroids,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    dist = x_sq.T[:, :, None] + c_sq[:, None, :] - 2.0 * xc.transpose(1, 0, 2)
    return dist


def encode(
    embeds: jnp.ndarray,
    centroids: jnp.ndarray,
    use_constraint: bool = False,
    sk_epsilon: float = 0.003,
    sk_iters: int = 100,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Assign codes: nearest centroid, or Sinkhorn-constrained assignment.

    Returns (B, M) int32. Reference: RepCONC.quantize
    (modeling_repconc.py:47-67). No gradients flow (assignment is discrete).
    """
    embeds = jax.lax.stop_gradient(embeds)
    centroids = jax.lax.stop_gradient(centroids)
    distances = pairwise_sqdist(embeds, centroids)  # (M, B, K)
    if not use_constraint:
        return jnp.argmin(distances, axis=-1).T.astype(jnp.int32)
    return sinkhorn_assign(distances, sk_epsilon, sk_iters, axis_name)


def decode(codes: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct embeddings from codes; differentiable w.r.t. centroids.

    codes: (B, M) int; centroids: (M, K, dsub). Returns (B, D).
    Reference: modeling_repconc.py:168-184.
    """
    K = centroids.shape[1]
    onehot = jax.nn.one_hot(codes, K, dtype=centroids.dtype)  # (B, M, K)
    # HIGHEST so the 0/1 matmul reproduces centroid values bit-exactly
    # (bf16 MXU inputs would truncate the fp32 codebook).
    sub = jnp.einsum("bmk,mkd->bmd", onehot, centroids,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    B = codes.shape[0]
    return sub.reshape(B, -1).astype(centroids.dtype)


def decode_gather(codes: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Gather-based decode for inference paths (no grad to centroids needed).

    Cheaper than the one-hot einsum when B is large (corpus-scale decode).
    """
    sub = jax.vmap(lambda table, code: jnp.take(table, code, axis=0),
                   in_axes=(0, 1), out_axes=1)(centroids, codes)  # (B, M, dsub)
    return sub.reshape(codes.shape[0], -1)


def normalize_centroids(centroids: jnp.ndarray) -> jnp.ndarray:
    """Per-centroid L2 normalization for METRIC_CENTROID_COS
    (reference: modeling_repconc.py:112-116)."""
    norm = jnp.linalg.norm(centroids, axis=-1, keepdims=True)
    return centroids / jnp.maximum(norm, 1e-12)


def normalize_subvectors(embeds: jnp.ndarray, M: int) -> jnp.ndarray:
    """Per-subvector L2 normalization of embeddings for METRIC_CENTROID_COS
    (reference: modeling_repconc.py:99-100)."""
    x = subvector_view(embeds, M)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x = x / jnp.maximum(norm, 1e-12)
    return x.reshape(embeds.shape)
