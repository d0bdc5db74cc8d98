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
    x = subvector_view(embeds, M).transpose(1, 0, 2)  # (M, B, dsub)
    return _sqdist_mbk(x, centroids)


def _sqdist_mbk(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(M, B, dsub) x (M, K, dsub) -> (M, B, K) squared distances — THE
    ranking-critical expansion, shared by the chunked and unchunked encode
    paths so a precision/metric change can never make them diverge.

    HIGHEST precision: argmin over distances must be exact in fp32 — the
    TPU default would route this matmul through bf16 and flip assignments.
    """
    x_sq = jnp.sum(x * x, axis=-1)  # (M, B)
    c_sq = jnp.sum(centroids * centroids, axis=-1)  # (M, K)
    xc = jnp.einsum("mbd,mkd->mbk", x, centroids,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return x_sq[:, :, None] + c_sq[:, None, :] - 2.0 * xc


def round_to_divisor(n: int, chunk: int) -> int:
    """Largest divisor of n that is <= chunk (>= 1). User-passed chunk sizes
    are normalized through this in encode/decode/contrastive_loss so a
    non-dividing value can never silently disable chunking and restore the
    multi-GB unchunked intermediates at production scale."""
    chunk = max(1, min(chunk, n))
    while n % chunk != 0:
        chunk -= 1
    return chunk


def _auto_m_chunk(B: int, M: int, K: int) -> int:
    """Largest divisor of M keeping one (mc, B, K) fp32 buffer <= ~256 MB.

    Sinkhorn holds a handful of (mc, B, K) temporaries live per iteration;
    at the reference's production step (B≈49k docs, M=48, K=256) the
    unchunked (M, B, K) tensor alone is 2.4 GB — several live copies of it
    overflow a 16 GB chip. Subspace OT problems are independent, so chunking
    M changes nothing numerically.
    """
    budget = 256 * 1024 * 1024 // 4  # fp32 elements
    mc = M
    while mc > 1 and mc * B * K > budget:
        next_mc = mc - 1
        while next_mc > 1 and M % next_mc != 0:
            next_mc -= 1
        mc = next_mc
    return mc


def encode(
    embeds: jnp.ndarray,
    centroids: jnp.ndarray,
    use_constraint: bool = False,
    sk_epsilon: float = 0.003,
    sk_iters: int = 100,
    axis_name: Optional[str] = None,
    m_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Assign codes: nearest centroid, or Sinkhorn-constrained assignment.

    Returns (B, M) int32. Reference: RepCONC.quantize
    (modeling_repconc.py:47-67). No gradients flow (assignment is discrete).

    m_chunk: process subspaces in chunks of this size under `lax.map`
    (None = auto). Subspace assignment problems are independent, so the
    result is identical; chunking bounds peak memory at production batch
    sizes (49k docs/step) where the full (M, B, K) cost tensor plus Sinkhorn
    temporaries would overflow HBM.
    """
    embeds = jax.lax.stop_gradient(embeds)
    centroids = jax.lax.stop_gradient(centroids)
    M, K = centroids.shape[0], centroids.shape[1]
    B = embeds.shape[0]
    mc = _auto_m_chunk(B, M, K) if m_chunk is None else round_to_divisor(M, m_chunk)
    if mc < M:
        x = subvector_view(embeds, M).transpose(1, 0, 2)  # (M, B, dsub)
        xs = x.reshape(M // mc, mc, B, -1)
        cs = centroids.reshape(M // mc, mc, K, -1)

        def one(args):
            xm, cm = args  # (mc, B, dsub), (mc, K, dsub)
            d = _sqdist_mbk(xm, cm)  # (mc, B, K)
            if not use_constraint:
                return jnp.argmin(d, axis=-1).T.astype(jnp.int32)
            return sinkhorn_assign(d, sk_epsilon, sk_iters, axis_name)

        codes = jax.lax.map(one, (xs, cs))  # (M/mc, B, mc)
        return codes.transpose(1, 0, 2).reshape(B, M)
    distances = pairwise_sqdist(embeds, centroids)  # (M, B, K)
    if not use_constraint:
        return jnp.argmin(distances, axis=-1).T.astype(jnp.int32)
    return sinkhorn_assign(distances, sk_epsilon, sk_iters, axis_name)


def _decode_block(codes: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    K = centroids.shape[1]
    onehot = jax.nn.one_hot(codes, K, dtype=centroids.dtype)  # (B, M, K)
    # HIGHEST so the 0/1 matmul reproduces centroid values bit-exactly
    # (bf16 MXU inputs would truncate the fp32 codebook).
    sub = jnp.einsum("bmk,mkd->bmd", onehot, centroids,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    B = codes.shape[0]
    return sub.reshape(B, -1).astype(centroids.dtype)


def decode(codes: jnp.ndarray, centroids: jnp.ndarray,
           b_chunk: Optional[int] = None) -> jnp.ndarray:
    """Reconstruct embeddings from codes; differentiable w.r.t. centroids.

    codes: (B, M) int; centroids: (M, K, dsub). Returns (B, D).
    Reference: modeling_repconc.py:168-184.

    Large batches are decoded in checkpointed chunks under `lax.map`
    (b_chunk=None -> auto): the (B, M, K) one-hot is 2.4 GB fp32 at the
    production 49k-doc step, and without rematerialization the scan would
    keep every chunk's one-hot alive for the backward pass.
    """
    B, M, K = codes.shape[0], centroids.shape[0], centroids.shape[1]
    budget = 256 * 1024 * 1024 // (4 * M * K)
    bc = max(1, budget) if b_chunk is None else max(1, b_chunk)
    bc = min(bc, B)
    if bc < B:
        # pad B up to a chunk multiple (static shapes: fine under jit) —
        # snapping bc to a DIVISOR of B instead degrades to bc=1 for prime
        # batch sizes, i.e. a length-B sequential scan
        Bpad = ((B + bc - 1) // bc) * bc
        codes_p = jnp.pad(codes, ((0, Bpad - B), (0, 0)))
        codes_c = codes_p.reshape(Bpad // bc, bc, M)
        dec = jax.checkpoint(lambda c: _decode_block(c, centroids))
        out = jax.lax.map(dec, codes_c)
        return out.reshape(Bpad, -1)[:B]
    return _decode_block(codes, centroids)


def decode_gather(codes: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Gather-based decode for inference paths (no grad to centroids needed).

    Cheaper than the one-hot einsum when B is large (corpus-scale decode).
    Out-of-range codes clamp to the nearest valid row (mode="clip"):
    jnp.take's default OOB fill would return NaN rows that silently poison
    anything built from the reconstructions (the one-hot `decode` yields
    zero rows in the same situation — neither is "right", but clamping is
    finite and deterministic).
    """
    sub = jax.vmap(lambda table, code: jnp.take(table, code, axis=0,
                                                mode="clip"),
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
