"""Encoder parity vs HuggingFace torch reference models (random tiny configs).

The load-bearing correctness test for the encoder zoo: convert an HF torch
checkpoint and require the flax forward to match the torch forward through
pooling to ~1e-4.
"""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

# TPU default matmul precision is bf16-ish: relax parity tolerances there
_ON_CPU = jax.devices()[0].platform == "cpu"
PAR_TOL = dict(rtol=2e-4, atol=2e-4) if _ON_CPU else dict(rtol=2e-2, atol=1e-2)
import jax.numpy as jnp

from repconc_tpu.core.config import EncoderConfig
from repconc_tpu.models.auto import (
    convert_hf_weights,
    encoder_config_from_hf,
    load_dense_encoder,
)
from repconc_tpu.models.transformer import DenseEncoder

TINY = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64)


def _random_inputs(rng, B=3, L=10, vocab=64, pad_from=6):
    ids = rng.integers(4, vocab, size=(B, L)).astype(np.int64)
    mask = np.ones((B, L), dtype=np.int64)
    mask[:, pad_from:] = 0
    ids[:, pad_from:] = 0
    return ids, mask


def _hf_pooled(model, ids, mask, pooling):
    with torch.no_grad():
        out = model(torch.tensor(ids), torch.tensor(mask)).last_hidden_state
    if pooling == "cls":
        emb = out[:, 0]
    else:
        m = torch.tensor(mask)[:, :, None].float()
        emb = (out * m).sum(1) / m.sum(1).clamp(min=1e-9)
    return emb.numpy()


def _flax_pooled(hf_config_dict, state_dict, ids, mask, pooling="cls"):
    cfg = encoder_config_from_hf(hf_config_dict)
    cfg.pooling = pooling
    params = convert_hf_weights(state_dict, cfg)
    module = DenseEncoder(cfg, "METRIC_IP")
    return np.asarray(module.apply({"params": params},
                                   jnp.asarray(ids), jnp.asarray(mask)))


def test_bert_parity(rng):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**TINY, pad_token_id=0)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    ids, mask = _random_inputs(rng)
    for pooling in ("cls", "mean"):
        ours = _flax_pooled(hf_cfg.to_dict(), sd, ids, mask, pooling)
        theirs = _hf_pooled(model, ids, mask, pooling)
        np.testing.assert_allclose(ours, theirs, **PAR_TOL)


def test_roberta_parity(rng):
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(**TINY, pad_token_id=1)
    model = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    ids, mask = _random_inputs(rng)
    ids[mask == 0] = 1  # roberta pad id
    ours = _flax_pooled(hf_cfg.to_dict(), sd, ids, mask, "cls")
    theirs = _hf_pooled(model, ids, mask, "cls")
    np.testing.assert_allclose(ours, theirs, **PAR_TOL)


def test_distilbert_parity(rng):
    from transformers import DistilBertConfig, DistilBertModel

    hf_cfg = DistilBertConfig(
        vocab_size=64, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=64)
    model = DistilBertModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    ids, mask = _random_inputs(rng)
    for pooling in ("cls", "mean"):
        ours = _flax_pooled(hf_cfg.to_dict(), sd, ids, mask, pooling)
        theirs = _hf_pooled(model, ids, mask, pooling)
        np.testing.assert_allclose(ours, theirs, **PAR_TOL)


def test_ance_projection_parity(rng):
    """ANCE = roberta + Linear + LayerNorm head on CLS (modeling_ance.py:15-31)."""
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(**TINY, pad_token_id=1)
    backbone = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    head = torch.nn.Linear(32, 32)
    norm = torch.nn.LayerNorm(32)

    sd = {f"roberta.{k}": v.numpy() for k, v in backbone.state_dict().items()}
    sd.update({f"embeddingHead.{k}": v.detach().numpy()
               for k, v in head.state_dict().items()})
    sd.update({f"norm.{k}": v.detach().numpy() for k, v in norm.state_dict().items()})

    hf_dict = hf_cfg.to_dict()
    hf_dict["model_type"] = "ance"
    cfg = encoder_config_from_hf(hf_dict)
    assert cfg.projection and cfg.pooling == "cls"
    params = convert_hf_weights(sd, cfg)
    module = DenseEncoder(cfg, "METRIC_IP")

    ids, mask = _random_inputs(rng)
    ids[mask == 0] = 1
    ours = np.asarray(module.apply({"params": params},
                                   jnp.asarray(ids), jnp.asarray(mask)))
    with torch.no_grad():
        h = backbone(torch.tensor(ids), torch.tensor(mask)).last_hidden_state
        theirs = norm(head(h[:, 0])).numpy()
    np.testing.assert_allclose(ours, theirs, **PAR_TOL)


def test_tct_mean_skip4_parity(rng):
    """TCT pooling: mean over tokens[4:] (modeling_tct.py:19-21)."""
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**TINY, pad_token_id=0)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    ids, mask = _random_inputs(rng, L=12, pad_from=9)
    ours = _flax_pooled(hf_cfg.to_dict(), sd, ids, mask, "mean_skip4")
    with torch.no_grad():
        out = model(torch.tensor(ids), torch.tensor(mask)).last_hidden_state
        tok = out[:, 4:, :]
        m = torch.tensor(mask)[:, 4:, None].float()
        theirs = ((tok * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()
    np.testing.assert_allclose(ours, theirs, **PAR_TOL)


def test_metric_cos_normalization(rng):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**TINY, pad_token_id=0)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = encoder_config_from_hf(hf_cfg.to_dict())
    params = convert_hf_weights(sd, cfg)
    module = DenseEncoder(cfg, "METRIC_COS")
    ids, mask = _random_inputs(rng)
    out = np.asarray(module.apply({"params": params},
                                  jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_load_dense_encoder_from_dir(rng, tmp_path):
    """End-to-end: HF save_pretrained dir -> load_dense_encoder."""
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**TINY, pad_token_id=0)
    hf_cfg.pooling = "mean"
    hf_cfg.similarity_metric = "METRIC_COS"
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    model.save_pretrained(tmp_path)

    cfg, params, metric = load_dense_encoder(str(tmp_path))
    assert cfg.pooling == "mean"
    assert metric == "METRIC_COS"
    ids, mask = _random_inputs(rng)
    module = DenseEncoder(cfg, metric)
    out = np.asarray(module.apply({"params": params},
                                  jnp.asarray(ids), jnp.asarray(mask)))
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_export_hf_weights_roundtrip(rng):
    """flax -> HF export (auto.export_hf_weights) must invert the HF -> flax
    conversion exactly: convert, export, re-convert, compare forwards."""
    from transformers import BertConfig, BertModel

    from repconc_tpu.models.auto import export_hf_weights

    hf_cfg = BertConfig(**TINY, pad_token_id=0)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = encoder_config_from_hf(hf_cfg.to_dict())
    params = convert_hf_weights(sd, cfg)

    sd2 = export_hf_weights(params, cfg)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, atol=1e-7)


def test_export_hf_weights_roundtrip_distilbert(rng):
    from transformers import DistilBertConfig, DistilBertModel

    from repconc_tpu.models.auto import export_hf_weights

    hf_cfg = DistilBertConfig(
        vocab_size=64, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=64)
    model = DistilBertModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = encoder_config_from_hf(hf_cfg.to_dict())
    params = convert_hf_weights(sd, cfg)
    sd2 = export_hf_weights(params, cfg)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, atol=1e-7)
