"""Mesh-sharded inference tests (8 virtual CPU devices)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from repconc_tpu.index.adc import adc_search
from repconc_tpu.index.flat import flat_search
from repconc_tpu.parallel.sharded import (
    sharded_adc_search, sharded_flat_search, sharded_encode_fn)


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("dp",))


def test_sharded_flat_matches_single(mesh, rng):
    q = rng.normal(size=(6, 16)).astype(np.float32)
    c = rng.normal(size=(512, 16)).astype(np.float32)
    s1, i1 = sharded_flat_search(mesh, q, c, topk=10)
    s2, i2 = flat_search(q, c, topk=10)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_flat_topk_wider_than_shard(mesh, rng):
    """topk > N/mesh.size must widen back to min(topk, N) at the merge —
    regression for silently returning only ceil(N/W) columns (which
    understates Recall@k for every k above the per-device shard size)."""
    q = rng.normal(size=(4, 16)).astype(np.float32)
    c = rng.normal(size=(200, 16)).astype(np.float32)  # 25 docs/device
    s1, i1 = sharded_flat_search(mesh, q, c, topk=100)
    assert s1.shape == (4, 100) and i1.shape == (4, 100)
    s2, i2 = flat_search(q, c, topk=100)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    np.testing.assert_array_equal(i1, i2)
    # topk > N clamps to N
    s3, _ = sharded_flat_search(mesh, q, c, topk=1000)
    assert s3.shape == (4, 200)


def test_sharded_adc_topk_wider_than_shard(mesh, rng):
    M, K, dsub = 4, 16, 8
    q = rng.normal(size=(3, M * dsub)).astype(np.float32)
    cent = rng.normal(size=(M, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, size=(160, M)).astype(np.uint8)  # 20/device
    s1, i1 = sharded_adc_search(mesh, q, codes, cent, topk=64)
    assert s1.shape == (3, 64)
    s2, i2 = adc_search(q, codes, cent, topk=64)
    np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1),
                               rtol=1e-4, atol=1e-4)


def test_sharded_adc_matches_single(mesh, rng):
    M, K, dsub = 4, 16, 8
    q = rng.normal(size=(5, M * dsub)).astype(np.float32)
    cent = rng.normal(size=(M, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, size=(800, M)).astype(np.uint8)
    s1, i1 = sharded_adc_search(mesh, q, codes, cent, topk=10)
    s2, i2 = adc_search(q, codes, cent, topk=10)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)
    # scores of chosen ids must match (ids can permute within ties)
    from repconc_tpu.quant.codebook import decode_gather

    rec = np.asarray(decode_gather(jnp.asarray(codes.astype(np.int32)),
                                   jnp.asarray(cent)))
    for qq in range(5):
        np.testing.assert_allclose(rec[i1[qq]] @ q[qq], s1[qq],
                                   rtol=1e-4, atol=1e-4)


def test_sharded_encode(mesh, rng):
    from repconc_tpu.core.config import EncoderConfig, RepConcConfig
    from repconc_tpu.models import repconc_model

    enc = EncoderConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=32,
                        hidden_dropout=0.0, attention_dropout=0.0)
    cfg = RepConcConfig(encoder=enc, MCQ_M=4, MCQ_K=16)
    params = repconc_model.init_params(cfg, jax.random.key(0))

    def encode(params, ids, mask):
        return repconc_model.encode_continuous(cfg, params, ids, mask)

    ids = jnp.asarray(rng.integers(4, 64, size=(16, 8)), dtype=jnp.int32)
    mask = jnp.ones((16, 8), dtype=jnp.int32)
    single = encode(params, ids, mask)
    sharded = sharded_encode_fn(mesh, encode)(params, ids, mask)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-4, atol=2e-5)


def test_sharded_pallas_adc_matches_single(mesh, rng):
    """Corpus-sharded Pallas PQ index == single-device Pallas index."""
    from repconc_tpu.index.pallas_adc import PallasADCIndex
    from repconc_tpu.parallel.sharded import ShardedPallasADCIndex

    M, K, dsub = 8, 16, 4
    N = 2100  # not divisible by 8: exercises per-shard valid masking
    q = rng.normal(size=(6, M * dsub)).astype(np.float32)
    cent = rng.normal(size=(M, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    s1, i1 = ShardedPallasADCIndex(mesh, codes, cent).search(q, topk=16)
    s2, i2 = PallasADCIndex(codes, cent).search(q, topk=16)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)
    overlap = np.mean([len(set(i1[r]) & set(i2[r])) / 16 for r in range(6)])
    assert overlap > 0.9, overlap  # ties may permute


def test_sharded_pallas_ivf_matches_single(mesh, rng):
    """Cell-sharded Pallas IVF == single-device Pallas IVF, zero overflow."""
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex, ShardedPallasIVFIndex

    N, D, M, K = 4000, 32, 8, 16
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:1500]), M=M, K=K, iters=4)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=2048)
    index = build_ivf(embeds, codes, cent, nlist=24, kmeans_iters=4)
    queries = embeds[:8]
    s1, i1 = ShardedPallasIVFIndex(mesh, index).search(queries, topk=10, nprobe=6)
    s2, i2 = PallasIVFIndex(index).search(queries, topk=10, nprobe=6)
    overlap = np.mean([len(set(i1[r]) & set(i2[r])) / 10 for r in range(8)])
    assert overlap > 0.9, overlap
    finite = np.isfinite(s1) & np.isfinite(s2)
    np.testing.assert_allclose(s1[finite], s2[finite], rtol=1e-4, atol=1e-4)


def test_sharded_pallas_ivf_overflow_self_heals(mesh, rng):
    """A deliberately tiny capacity factor must be DETECTED (overflow
    count > 0) and self-healed by a worst-case-shape retry — results must
    equal an overflow-free search, never silently drop pairs."""
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked
    from repconc_tpu.index.pallas_ivf import ShardedPallasIVFIndex

    N, D, M, K = 1500, 32, 8, 16
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:800]), M=M, K=K, iters=3)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=3)
    tight = ShardedPallasIVFIndex(mesh, index, capacity_factor=0.01)
    # 64 queries x nprobe=16 over 16 cells, 8 devices: each device owns 2
    # cells, each probed by all 64 queries -> 2 tiles/cell = 4 owned tiles,
    # but T_cap = 0 + nlist_local(2) + 1 = 3 -> tiles overflow
    _, _, overflow = tight.search_device(embeds[:64], topk=10, nprobe=16)
    assert int(overflow) > 0  # the adversarial mix really does overflow
    s1, i1 = tight.search(embeds[:64], topk=10, nprobe=16)
    roomy = ShardedPallasIVFIndex(mesh, index, capacity_factor=1.5)
    s2, i2 = roomy.search(embeds[:64], topk=10, nprobe=16)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)
    for r in range(64):
        assert set(i1[r].tolist()) == set(i2[r].tolist())


def test_sharded_pallas_ivf_multi_axis_mesh(rng):
    """Cell ownership must use the SHARDED axis's extent, not mesh.size: on
    a (4, 2) mesh cells are split 4 ways, and modulo-mesh.size ownership
    would leave half of all cells owned by no device (silently dropped,
    overflow=0)."""
    from jax.sharding import Mesh as JMesh
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex, ShardedPallasIVFIndex

    N, D, M, K = 2000, 32, 8, 16
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:800]), M=M, K=K, iters=3)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=3)
    mesh2d = JMesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "mp"))
    queries = embeds[:8]
    s1, i1 = ShardedPallasIVFIndex(mesh2d, index).search(queries, topk=10,
                                                         nprobe=8)
    s2, i2 = PallasIVFIndex(index).search(queries, topk=10, nprobe=8)
    overlap = np.mean([len(set(i1[r]) & set(i2[r])) / 10 for r in range(8)])
    assert overlap > 0.9, overlap


def test_sharded_pallas_ivf_pads_with_minus_one(mesh, rng):
    """Fewer real candidates than topk: filler slots must be id -1 at
    -inf (like the single-chip path), never spurious real doc ids."""
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked
    from repconc_tpu.index.pallas_ivf import ShardedPallasIVFIndex

    N, D, M, K = 600, 32, 8, 16
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:400]), M=M, K=K, iters=3)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=512)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=3)
    sharded = ShardedPallasIVFIndex(mesh, index)
    # nprobe=2 of 16 cells: candidates << topk=500
    s, i = sharded.search(embeds[:4], topk=500, nprobe=2)
    for r in range(4):
        empty = ~np.isfinite(s[r])
        assert empty.any()  # the probe really is starved
        assert (i[r][empty] == -1).all(), i[r][empty][:5]
        real = i[r][~empty]
        assert len(set(real.tolist())) == len(real)  # no duplicate ids


def test_sharded_pallas_ivf_int8_matches_single_int8(mesh, rng):
    """int8-LUT quantization is deterministic per (query, group), so the
    cell-sharded int8 search must match the single-chip int8 search: every
    device scores with identical tables and the exact-top-k merge sees the
    same score for every (query, doc) pair."""
    from repconc_tpu.index.ivf import build_ivf
    from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked
    from repconc_tpu.index.pallas_ivf import (PallasIVFIndex,
                                              ShardedPallasIVFIndex)

    N, D, M, K = 3000, 32, 8, 16
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:1200]), M=M, K=K, iters=4)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=2048)
    index = build_ivf(embeds, codes, cent, nlist=20, kmeans_iters=4)
    queries = embeds[:8]
    s1, i1 = ShardedPallasIVFIndex(mesh, index).search(
        queries, topk=10, nprobe=5, lut_dtype="int8")
    s2, i2 = PallasIVFIndex(index).search(
        queries, topk=10, nprobe=5, lut_dtype="int8")
    overlap = np.mean([len(set(i1[r]) & set(i2[r])) / 10 for r in range(8)])
    assert overlap > 0.9, overlap  # ties may permute at quantized scores
    finite = np.isfinite(s1) & np.isfinite(s2)
    np.testing.assert_allclose(s1[finite], s2[finite], rtol=1e-4, atol=1e-4)
    # and the quantization really engaged: int8 scores differ from bf16
    s_bf, _ = PallasIVFIndex(index).search(queries, topk=10, nprobe=5)
    assert not np.allclose(s_bf[np.isfinite(s_bf)], s2[np.isfinite(s2)])
