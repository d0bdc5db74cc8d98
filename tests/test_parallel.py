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
