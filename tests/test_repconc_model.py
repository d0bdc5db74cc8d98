"""RepCONC model forward, persistence, and warmup-integration tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from repconc_tpu.core.config import EncoderConfig, RepConcConfig
from repconc_tpu.models import repconc_model
from repconc_tpu.quant import codebook

TINY_ENC = EncoderConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=64)


@pytest.fixture
def tiny_model():
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    return cfg, params


def _batch(rng, B=6, L=10):
    ids = rng.integers(4, 64, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=np.int32)
    mask[:, 8:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_forward_shapes(tiny_model, rng):
    cfg, params = tiny_model
    ids, mask = _batch(rng)
    out = repconc_model.forward(cfg, params, ids, mask,
                                return_code=True, return_quantized_embedding=True)
    assert out.continuous_embeds.shape == (6, 32)
    assert out.discrete_codes.shape == (6, 4)
    assert out.quantized_embeds.shape == (6, 32)
    # quantized embeds decode exactly from codes
    np.testing.assert_allclose(
        np.asarray(out.quantized_embeds),
        np.asarray(codebook.decode(out.discrete_codes, params["centroids"])),
        rtol=1e-6)


def test_forward_with_provided_codes(tiny_model, rng):
    cfg, params = tiny_model
    ids, mask = _batch(rng)
    codes = jnp.asarray(rng.integers(0, 16, size=(6, 4)), dtype=jnp.int32)
    out = repconc_model.forward(cfg, params, ids, mask, discrete_codes=codes,
                                return_quantized_embedding=True)
    np.testing.assert_array_equal(np.asarray(out.discrete_codes), np.asarray(codes))


def test_rotation_applied(tiny_model, rng):
    cfg, params = tiny_model
    ids, mask = _batch(rng)
    base = repconc_model.encode_continuous(cfg, params, ids, mask)
    # a permutation rotation permutes output dims
    perm = np.eye(32, dtype=np.float32)[::-1].copy()
    params2 = dict(params, rotation=jnp.asarray(perm))
    out = repconc_model.encode_continuous(cfg, params2, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base)[:, ::-1],
                               rtol=1e-5, atol=1e-5)


def test_centroid_cos_normalizes_subvectors(rng):
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16,
                        similarity_metric="METRIC_CENTROID_COS")
    params = repconc_model.init_params(cfg, jax.random.key(0))
    # init normalizes centroids
    norms = np.linalg.norm(np.asarray(params["centroids"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    ids, mask = _batch(rng)
    out = repconc_model.encode_continuous(cfg, params, ids, mask)
    sub = np.asarray(out).reshape(6, 4, 8)
    np.testing.assert_allclose(np.linalg.norm(sub, axis=-1), 1.0, rtol=1e-5)


def test_save_load_roundtrip(tiny_model, rng, tmp_path):
    cfg, params = tiny_model
    repconc_model.save_pretrained(str(tmp_path), cfg, params)
    cfg2, params2 = repconc_model.from_pretrained(str(tmp_path))
    assert cfg2.MCQ_M == cfg.MCQ_M
    ids, mask = _batch(rng)
    a = repconc_model.encode_continuous(cfg, params, ids, mask)
    b = repconc_model.encode_continuous(cfg2, params2, ids, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_from_dense_encoder(rng, tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64, pad_token_id=0)
    BertModel(hf_cfg, add_pooling_layer=False).save_pretrained(tmp_path)

    cfg, params = repconc_model.from_dense_encoder(
        str(tmp_path), MCQ_M=4, MCQ_K=16, similarity_metric="METRIC_IP",
        pooling="mean")
    assert cfg.encoder.pooling == "mean"
    assert params["centroids"].shape == (4, 16, 8)
    ids, mask = _batch(rng)
    out = repconc_model.forward(cfg, params, ids, mask, return_code=True)
    assert out.discrete_codes.shape == (6, 4)


def test_sequences_beyond_position_table_stay_finite(tiny_model, rng):
    """max_position_embeddings=64; a longer sequence must clamp positions
    rather than reading out-of-range embedding rows (NaN on TPU gather)."""
    cfg, params = tiny_model
    L = cfg.encoder.max_position_embeddings + 32
    ids = jnp.asarray(rng.integers(4, 64, size=(2, L)), dtype=jnp.int32)
    mask = jnp.ones((2, L), dtype=jnp.int32)
    out = repconc_model.encode_continuous(cfg, params, ids, mask)
    assert np.isfinite(np.asarray(out)).all()
