"""Codebook encode/decode round-trips and gradient topology."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repconc_tpu.quant.codebook import (
    encode, decode, decode_gather, pairwise_sqdist,
    normalize_centroids, normalize_subvectors,
)
from repconc_tpu.quant.losses import (
    straight_through, false_negative_mask, duplicate_negative_mask,
    contrastive_loss, mse_loss,
)


def setup_data(rng, B=32, M=4, K=16, dsub=8):
    x = rng.normal(size=(B, M * dsub)).astype(np.float32)
    c = rng.normal(size=(M, K, dsub)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(c)


def test_pairwise_sqdist_bruteforce(rng):
    x, c = setup_data(rng)
    d = np.asarray(pairwise_sqdist(x, c))  # (M, B, K)
    xs = np.asarray(x).reshape(32, 4, 8)
    expected = ((xs[:, :, None, :] - np.asarray(c)[None]) ** 2).sum(-1)  # (B,M,K)
    np.testing.assert_allclose(d, expected.transpose(1, 0, 2), rtol=1e-4, atol=1e-4)


def test_encode_argmin(rng):
    x, c = setup_data(rng)
    codes = np.asarray(encode(x, c, use_constraint=False))
    d = np.asarray(pairwise_sqdist(x, c))
    np.testing.assert_array_equal(codes, d.argmin(-1).T)


def test_decode_matches_gather(rng):
    x, c = setup_data(rng)
    codes = encode(x, c)
    d1 = np.asarray(decode(codes, c))
    d2 = np.asarray(decode_gather(codes, c))
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)
    # each subvector equals the selected centroid
    cc = np.asarray(codes)
    cn = np.asarray(c)
    for b in range(4):
        for m in range(4):
            np.testing.assert_allclose(
                d1[b, m * 8:(m + 1) * 8], cn[m, cc[b, m]], rtol=1e-5, atol=1e-6)


def test_decode_exact_roundtrip(rng):
    # embeddings that ARE centroids decode to themselves
    _, c = setup_data(rng)
    codes = jnp.asarray(rng.integers(0, 16, size=(10, 4)), dtype=jnp.int32)
    x = decode(codes, c)
    codes2 = encode(x, c)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def test_decode_centroid_gradient(rng):
    x, c = setup_data(rng)
    codes = encode(x, c)

    def loss(cent):
        return jnp.sum(decode(codes, cent) ** 2)

    g = np.asarray(jax.grad(loss)(c))
    # gradient only lands on selected centroids
    used = np.zeros((4, 16), dtype=bool)
    cc = np.asarray(codes)
    for b in range(cc.shape[0]):
        for m in range(4):
            used[m, cc[b, m]] = True
    nonzero = (np.abs(g).sum(-1) > 0)
    assert (nonzero == used).all()


def test_straight_through_grads(rng):
    x, c = setup_data(rng)
    codes = encode(x, c)

    def loss(cent, cont):
        rep = straight_through(decode(codes, cent), cont)
        return jnp.sum(rep * 3.0)

    gc_, gx = jax.grad(loss, argnums=(0, 1))(c, x)
    # encoder side receives the same upstream grad (3.0 everywhere)
    np.testing.assert_allclose(np.asarray(gx), 3.0)
    # centroid side nonzero
    assert np.abs(np.asarray(gc_)).sum() > 0
    # value equals pure decode
    rep = straight_through(decode(codes, c), x)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(decode(codes, c)), rtol=1e-6)


def test_normalize_centroids(rng):
    _, c = setup_data(rng)
    cn = np.asarray(normalize_centroids(c))
    np.testing.assert_allclose(np.linalg.norm(cn, axis=-1), 1.0, rtol=1e-5)


def test_normalize_subvectors(rng):
    x, _ = setup_data(rng)
    xn = np.asarray(normalize_subvectors(x, 4)).reshape(32, 4, 8)
    np.testing.assert_allclose(np.linalg.norm(xn, axis=-1), 1.0, rtol=1e-5)


def test_false_negative_mask():
    qids = jnp.asarray([0, 1])
    doc_ids = jnp.asarray([10, 20, 30, 10])
    positives = jnp.asarray([[10, -1], [20, 30]])
    m = np.asarray(false_negative_mask(qids, doc_ids, positives))
    # q0: docs 10 (pos) at col 0 (diagonal, excluded) and col 3 (masked)
    assert not m[0, 0] and m[0, 3] and not m[0, 1] and not m[0, 2]
    # q1: doc 20 at col 1 is its diagonal, doc 30 at col 2 masked
    assert not m[1, 1] and m[1, 2]


def test_duplicate_negative_mask():
    qids = jnp.asarray([0, 1])
    doc_ids = jnp.asarray([10, 20, 10, 20])
    m = np.asarray(duplicate_negative_mask(qids, doc_ids))
    # cols 2,3 duplicate cols 0,1
    assert m[0, 2] and m[0, 3] and m[1, 2] and m[1, 3]
    assert not m[0, 0] and not m[1, 1]
    # diagonal never masked
    assert not m[0, 0] and not m[1, 1]


def test_duplicate_negative_mask_matches_pairwise(rng):
    """Sort-based dup flags == O(n^2) pairwise reference, incl. Bd>=4096
    (the production global-batch scale where pairwise would be ~2.4 GB)."""
    for n in (16, 257, 4096):
        doc_ids = jnp.asarray(rng.integers(0, max(n // 2, 1), size=(n,)),
                              dtype=jnp.int32)
        nq = min(n, 64)
        qids = jnp.arange(nq, dtype=jnp.int32)
        m = np.asarray(duplicate_negative_mask(qids, doc_ids))
        ids = np.asarray(doc_ids)
        dup = np.any(np.triu(ids[:, None] == ids[None, :], k=1), axis=0)
        expect = np.broadcast_to(dup[None, :], (nq, n)).copy()
        expect[np.arange(nq), np.arange(nq)] = False
        np.testing.assert_array_equal(m, expect)


def test_false_negative_mask_matches_dense_reference(rng):
    """P-loop accumulation == 3-D broadcast reference at Bd>=4096."""
    B, Bd, P = 64, 4096, 8
    doc_ids = jnp.asarray(rng.integers(0, 2048, size=(Bd,)), dtype=jnp.int32)
    positives = rng.integers(0, 2048, size=(B, P)).astype(np.int32)
    positives[rng.random((B, P)) < 0.5] = -1
    qids = jnp.arange(B, dtype=jnp.int32)
    m = np.asarray(false_negative_mask(qids, doc_ids, jnp.asarray(positives)))
    eq = positives[:, None, :] == np.asarray(doc_ids)[None, :, None]
    expect = np.any(eq & (positives[:, None, :] >= 0), axis=-1)
    expect[np.arange(B), np.arange(B)] = False
    np.testing.assert_array_equal(m, expect)


def test_contrastive_loss_basic(rng):
    B, D = 4, 8
    q = jnp.asarray(np.eye(B, D, dtype=np.float32) * 10)
    d = jnp.asarray(np.eye(B, D, dtype=np.float32) * 10)
    mask = jnp.zeros((B, B), dtype=bool)
    loss = contrastive_loss(q, d, mask, mcq_m=4)
    assert float(loss) < 0.01  # perfectly separable

    # masking the positive's duplicate makes no difference; masking a strong
    # confuser lowers the loss
    d2 = np.asarray(d).copy()
    d2[1] = np.asarray(q)[0]  # doc 1 identical to query 0 -> confuser
    d2 = jnp.asarray(d2)
    loss_conf = contrastive_loss(q, d2, mask, mcq_m=4)
    mask2 = mask.at[0, 1].set(True)
    loss_masked = contrastive_loss(q, d2, mask2, mcq_m=4)
    assert float(loss_masked) < float(loss_conf)


def test_mask_dominates_at_small_temperature():
    """The false-negative mask must hold at production temperatures: with
    unnormalized METRIC_IP embeddings and temperature 0.02, sims/temp
    reaches ~1e4, so an additive -10000 applied AFTER the division would
    let a masked judged positive out-score real negatives. A fully-masked
    strong confuser must leave the loss as if the confuser were weak."""
    B, D = 4, 8
    q = np.eye(B, D, dtype=np.float32) * 20
    d = np.eye(B, D, dtype=np.float32) * 5   # diagonal positives: sim 100
    d[1] = q[0]                              # doc 1: sim 400 to query 0
    mask = jnp.zeros((B, B), dtype=bool).at[0, 1].set(True)
    loss_masked = contrastive_loss(jnp.asarray(q), jnp.asarray(d), mask,
                                   mcq_m=4, temperature=0.02)
    # reference: same geometry with the confuser genuinely absent. Post-
    # division additive masking gives confuser logit 400/0.02-1e4 = 1e4,
    # DOMINATING the positive's 5e3 -> loss ~5e3; correct masking ~0.
    d_clean = d.copy()
    d_clean[1] = 0.0
    loss_clean = contrastive_loss(jnp.asarray(q), jnp.asarray(d_clean), mask,
                                  mcq_m=4, temperature=0.02)
    assert abs(float(loss_masked) - float(loss_clean)) < 1e-3, (
        float(loss_masked), float(loss_clean))


def test_contrastive_dynamic_topk(rng):
    B, D = 8, 16
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)) + q
    mask = jnp.zeros((B, B), dtype=bool)
    full = contrastive_loss(q, d, mask, mcq_m=4)
    topk = contrastive_loss(q, d, mask, mcq_m=4, dynamic_topk_hard_negative=2)
    # with fewer (but hardest) negatives the normalizer shrinks
    assert np.isfinite(float(topk))
    assert float(topk) <= float(full) + 1e-5


def test_mse_loss(rng):
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    b = a + 1.0
    assert abs(float(mse_loss(a, b)) - 8.0) < 1e-4


def test_encode_m_chunked_matches_unchunked(rng):
    """Subspace-chunked encode (the production-scale memory path) is exact:
    per-subspace OT problems are independent, so chunking M cannot change
    assignments — for both the argmin and the Sinkhorn-constrained path."""
    x, c = setup_data(rng, B=64, M=8, K=16, dsub=4)
    for use_constraint in (False, True):
        full = np.asarray(encode(x, c, use_constraint=use_constraint,
                                 sk_epsilon=0.05, sk_iters=25, m_chunk=8))
        for mc in (1, 2, 4):
            chunked = np.asarray(encode(x, c, use_constraint=use_constraint,
                                        sk_epsilon=0.05, sk_iters=25,
                                        m_chunk=mc))
            np.testing.assert_array_equal(full, chunked)


def test_encode_auto_m_chunk_threshold():
    """Auto chunking only engages above the memory budget."""
    from repconc_tpu.quant.codebook import _auto_m_chunk
    assert _auto_m_chunk(B=4096, M=48, K=256) == 48      # small batch: off
    mc = _auto_m_chunk(B=49152, M=48, K=256)             # reference scale
    assert mc < 48 and 48 % mc == 0
    assert mc * 49152 * 256 <= 256 * 1024 * 1024 // 4


def test_decode_b_chunked_matches_unchunked(rng):
    """Checkpointed chunked decode: same values, same centroid gradients."""
    x, c = setup_data(rng, B=64, M=4, K=16, dsub=8)
    codes = encode(x, c)

    full = np.asarray(decode(codes, c, b_chunk=64))
    chunked = np.asarray(decode(codes, c, b_chunk=16))
    np.testing.assert_array_equal(full, chunked)

    g_full = jax.grad(lambda cc: jnp.sum(decode(codes, cc, b_chunk=64) ** 2))(c)
    g_chunk = jax.grad(lambda cc: jnp.sum(decode(codes, cc, b_chunk=16) ** 2))(c)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                               rtol=1e-6, atol=1e-6)


def test_contrastive_q_chunked_matches_unchunked(rng):
    """Checkpointed query-chunked contrastive loss: same loss, same grads
    (incl. the dynamic-top-k path, which is per-row and thus chunk-exact)."""
    B, Bd, D = 16, 48, 32
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(Bd, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, Bd)) < 0.1)

    for topk in (None, 8):
        def loss(qq, dd, qc):
            return contrastive_loss(qq, dd, mask, 4, temperature=0.5,
                                    dynamic_topk_hard_negative=topk,
                                    q_chunk=qc)
        full, (gq, gd) = jax.value_and_grad(loss, argnums=(0, 1))(q, d, 16)
        chunked, (gq2, gd2) = jax.value_and_grad(loss, argnums=(0, 1))(q, d, 4)
        np.testing.assert_allclose(float(full), float(chunked), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gq2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gd2),
                                   rtol=1e-5, atol=1e-6)
