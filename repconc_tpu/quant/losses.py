"""Training losses: global-batch contrastive with masking, MSE, straight-through.

Rebuilds the reference's GradCache surrogate-gradient scheme
(finetune_repconc.py:346-431) as pure function composition:

The reference computes the contrastive loss on QUANTIZED doc embeds, then
back-propagates the cached rep-gradients through BOTH the continuous path
(encoder grads) and the quantized path (centroid grads) via two surrogate dot
products (finetune_repconc.py:368-373). In JAX that is exactly the
straight-through composition

    doc_rep = decode(codes) + continuous - stop_grad(continuous)

whose value equals decode(codes) and whose VJP routes the incoming gradient
to the centroids (through decode) AND to the encoder (through continuous),
each with the identical upstream gradient — no double counting.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF_MASK = 10000.0


@jax.custom_vjp
def straight_through(quantized: jnp.ndarray, continuous: jnp.ndarray) -> jnp.ndarray:
    """value = quantized (bit-exact); gradient flows to both inputs.

    custom_vjp instead of the classic `q + c - stop_grad(c)` so the forward
    value is exactly the quantized embedding (no cancellation error)."""
    return quantized


def _st_fwd(quantized, continuous):
    return quantized, None


def _st_bwd(_, g):
    return (g, g)


straight_through.defvjp(_st_fwd, _st_bwd)


def false_negative_mask(
    qids: jnp.ndarray,
    doc_ids: jnp.ndarray,
    query_positives: jnp.ndarray,
) -> jnp.ndarray:
    """mask[i, j] = True if doc j is a judged positive of query i (and i != j).

    query_positives: (B, P) padded array of positive docids per query
    (pad with -1). Device-side equivalent of the reference's python loop over
    qrels (finetune_repconc.py:433-440); the padded-positives array is built
    by the host collator.
    """
    del qids  # identity is carried by query_positives' row order
    B, P = query_positives.shape
    Bd = doc_ids.shape[0]
    # Accumulate over the (small, static) P axis instead of materializing a
    # (B, Bd, P) intermediate: at the reference's production scale
    # (B=4096, Bd=49k, P=8) the 3-D buffer would be ~1.6 GB.
    mask = jnp.zeros((B, Bd), dtype=bool)
    for p in range(P):
        col = query_positives[:, p:p + 1]          # (B, 1)
        mask |= (col == doc_ids[None, :]) & (col >= 0)
    diag = jnp.eye(B, Bd, dtype=bool)
    return mask & ~diag


def duplicate_negative_mask(qids: jnp.ndarray, doc_ids: jnp.ndarray) -> jnp.ndarray:
    """Mask repeated docids so each doc scores once per query
    (reference: finetune_repconc.py:442-451).

    Duplicate flags come from a stable sort instead of a pairwise (Bd, Bd)
    comparison — O(Bd log Bd) time and O(Bd) memory, so the reference's
    production batch (Bd ≈ 49k docs, where the pairwise matrix would be
    ~2.4 GB) fits trivially. Stable ties keep the first occurrence (smallest
    original index) as the non-masked survivor, matching the "duplicates an
    earlier doc" semantics exactly.
    """
    n = doc_ids.shape[0]
    order = jnp.argsort(doc_ids, stable=True)
    sorted_ids = doc_ids[order]
    dup_sorted = jnp.concatenate(
        [jnp.zeros((1,), dtype=bool), sorted_ids[1:] == sorted_ids[:-1]])
    dup = jnp.zeros((n,), dtype=bool).at[order].set(dup_sorted)
    mask = jnp.broadcast_to(dup[None, :], (qids.shape[0], n))
    diag = jnp.eye(qids.shape[0], n, dtype=bool)
    return mask & ~diag


def _row_ce(query_embeds, doc_embeds, negative_mask, labels, mcq_m,
            metric_centroid_cos, temperature, dynamic_topk_hard_negative):
    """Per-query cross-entropy terms (logZ - pos) for a block of query rows.

    labels: (Bq,) GLOBAL column index of each row's positive."""
    Bd = doc_embeds.shape[0]
    sims = jnp.einsum("qd,nd->qn", query_embeds, doc_embeds,
                      preferred_element_type=jnp.float32)
    if metric_centroid_cos:
        sims = sims / mcq_m
    # mask BEFORE temperature scaling: for unnormalized METRIC_IP at small
    # temperature, sims/temp reaches tens of thousands and an additive
    # -10000 applied after the division no longer dominates — a masked
    # judged positive could leak back into the softmax as a negative.
    # Pre-division the mask is scaled by 1/temp along with everything else.
    sims = sims - NEG_INF_MASK * negative_mask.astype(sims.dtype)
    if temperature != 1.0:
        sims = sims / temperature

    if dynamic_topk_hard_negative is not None and dynamic_topk_hard_negative > 0:
        # keep only [positive + top-k hardest negatives] per query; -inf
        # (not an additive constant) so no post-temperature magnitude can
        # leak a dropped column back into the softmax
        neg_sims = jax.lax.stop_gradient(sims)
        col = jnp.arange(Bd)[None, :]
        neg_sims = jnp.where(col == labels[:, None], -jnp.inf, neg_sims)
        # exact PartialReduce: lax.top_k's sort at user-set k (hundreds+)
        # can wedge the remote compiler (CLAUDE.md)
        kth = jax.lax.approx_max_k(
            neg_sims, dynamic_topk_hard_negative,
            recall_target=1.0)[0][:, -1:]
        keep = (neg_sims >= kth) | (col == labels[:, None])
        sims = jnp.where(keep, sims, -jnp.inf)

    logz = jax.scipy.special.logsumexp(sims, axis=-1)
    pos = jnp.take_along_axis(sims, labels[:, None], axis=-1)[:, 0]
    return logz - pos


def _auto_q_chunk(B: int, Bd: int) -> int:
    """Largest divisor of B keeping one (qc, Bd) fp32 block <= ~128 MB."""
    budget = 128 * 1024 * 1024 // 4
    qc = B
    while qc > 1 and qc * Bd > budget:
        next_qc = qc - 1
        while next_qc > 1 and B % next_qc != 0:
            next_qc -= 1
        qc = next_qc
    return qc


def contrastive_loss(
    query_embeds: jnp.ndarray,
    doc_embeds: jnp.ndarray,
    negative_mask: jnp.ndarray,
    mcq_m: int,
    metric_centroid_cos: bool = False,
    temperature: float = 1.0,
    dynamic_topk_hard_negative: Optional[int] = None,
    q_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Cross-entropy over the global batch with diagonal labels.

    query_embeds: (B, D); doc_embeds: (Bd, D) where Bd >= B and the first B
    docs are the diagonal positives. negative_mask: (B, Bd) bool, True where
    the similarity must be suppressed (false negatives / duplicates).
    Reference: compute_contrastive_loss (finetune_repconc.py:398-431).

    Query rows are processed in checkpointed chunks under `lax.map`
    (q_chunk=None -> auto): each row's CE term needs only its own (1, Bd)
    score row, so chunking is exact while bounding the live (B, Bd) score
    buffers — ~3 GB at the production 4096x49k step — to ~128 MB.
    """
    from repconc_tpu.quant.codebook import round_to_divisor

    B, Bd = query_embeds.shape[0], doc_embeds.shape[0]
    qc = _auto_q_chunk(B, Bd) if q_chunk is None else round_to_divisor(B, q_chunk)
    args = (mcq_m, metric_centroid_cos, temperature,
            dynamic_topk_hard_negative)
    if qc < B:
        q_c = query_embeds.reshape(B // qc, qc, -1)
        mask_c = negative_mask.reshape(B // qc, qc, Bd)
        labels_c = jnp.arange(B).reshape(B // qc, qc)
        row = jax.checkpoint(
            lambda t: jnp.sum(_row_ce(t[0], doc_embeds, t[1], t[2], *args)))
        sums = jax.lax.map(row, (q_c, mask_c, labels_c))
        return jnp.sum(sums) / B
    return jnp.mean(_row_ce(query_embeds, doc_embeds, negative_mask,
                            jnp.arange(B), *args))


def mse_loss(quantized: jnp.ndarray, continuous: jnp.ndarray) -> jnp.ndarray:
    """Reconstruction MSE, summed over dims, averaged over batch
    (reference: finetune_repconc.py:374)."""
    return jnp.mean(jnp.sum((quantized - continuous) ** 2, axis=-1))
