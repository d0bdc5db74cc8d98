"""Unified BERT-family dense encoder in flax.

One parametric transformer covers BERT / RoBERTa / DistilBERT (reference
keeps three copies: models/dense/modeling_dense.py:20-121) plus the ANCE
projection head and TCT pooling variants (examples/ance/modeling_ance.py,
examples/tct-colbert/modeling_tct.py). Differences are EncoderConfig data:

  * roberta:    position_offset = pad_token_id + 1 = 2
  * distilbert: type_vocab_size = 0 (no token-type embeddings)
  * ance:       projection = True (Linear + LayerNorm head on CLS)
  * tct:        pooling = "mean_skip4" (mean over tokens[4:])

Post-LayerNorm architecture throughout (BERT-style). Activations can run in
bfloat16 (cfg.dtype) with fp32 params and fp32 LayerNorm/softmax — the
TPU-friendly mixed-precision recipe.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from repconc_tpu.core.config import EncoderConfig

# HF "gelu" is the EXACT erf GELU; flax nn.gelu defaults to the tanh
# approximation, so the default must be overridden or every ported
# BERT/DistilBERT checkpoint (hidden_act="gelu") runs a different
# activation than the reference in all layers.
ACT = {"gelu": lambda x: nn.gelu(x, approximate=False), "relu": nn.relu,
       "gelu_new": lambda x: nn.gelu(x, approximate=True)}


class SelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic=True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        H, nh, hd = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim
        B, L, _ = hidden.shape

        q = nn.Dense(H, dtype=dtype, name="query")(hidden)
        k = nn.Dense(H, dtype=dtype, name="key")(hidden)
        v = nn.Dense(H, dtype=dtype, name="value")(hidden)
        q = q.reshape(B, L, nh, hd)
        k = k.reshape(B, L, nh, hd)
        v = v.reshape(B, L, nh, hd)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, dtype=scores.dtype))
        scores = scores + attention_bias  # (B, 1, 1, L) additive mask
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        probs = nn.Dropout(cfg.attention_dropout, name="attn_dropout")(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
        ctx = ctx.reshape(B, L, H)
        return nn.Dense(H, dtype=dtype, name="out")(ctx)


class TransformerLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic=True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        drop = nn.Dropout(cfg.hidden_dropout)
        attn = SelfAttention(cfg, name="attention")(hidden, attention_bias,
                                                    deterministic)
        attn = drop(attn, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="attention_ln")(hidden + attn)
        hidden = hidden.astype(dtype)
        up = nn.Dense(cfg.intermediate_size, dtype=dtype, name="mlp_up")(hidden)
        up = ACT[cfg.hidden_act](up)
        down = nn.Dense(cfg.hidden_size, dtype=dtype, name="mlp_down")(up)
        down = drop(down, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="mlp_ln")(hidden + down)
        return hidden.astype(dtype)


class TransformerEncoder(nn.Module):
    """Token ids -> last hidden states (B, L, H)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, L = input_ids.shape

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                        name="word_embeddings")(input_ids)
        positions = jnp.arange(L)[None, :] + cfg.position_offset
        if cfg.position_offset:
            # roberta: padding positions stay at pad index (they're masked
            # downstream anyway, but keeps parity with HF position_ids)
            positions = jnp.where(attention_mask > 0, positions, cfg.pad_token_id)
        # clamp: sequences longer than the position table must not read
        # out-of-range rows (XLA gather fill yields NaN on some backends)
        positions = jnp.minimum(positions, cfg.max_position_embeddings - 1)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=dtype,
                       name="position_embeddings")(positions)
        hidden = word + pos
        if cfg.type_vocab_size > 0:
            tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=dtype,
                                name="token_type_embeddings")(
                jnp.zeros_like(input_ids))
            hidden = hidden + tok_type
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="embeddings_ln")(hidden).astype(dtype)
        hidden = nn.Dropout(cfg.hidden_dropout, name="embed_dropout")(
            hidden, deterministic=deterministic)

        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = bias.astype(jnp.float32)
        for i in range(cfg.num_hidden_layers):
            hidden = TransformerLayer(cfg, name=f"layer_{i}")(
                hidden, bias, deterministic)
        return hidden


class DenseEncoder(nn.Module):
    """Full dense text encoder: transformer -> pooling -> optional projection
    -> optional metric normalization. Equivalent to the reference's
    BertDense/RobertaDense/DistilBertDense forward (modeling_dense.py:25-47)
    plus the ANCE/TCT adapter behaviors.

    similarity_metric handling: METRIC_COS L2-normalizes here; METRIC_IP and
    METRIC_CENTROID_COS pass through (CENTROID_COS normalization happens per
    subvector in the RepCONC head).
    """

    cfg: EncoderConfig
    similarity_metric: str = "METRIC_IP"

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        cfg = self.cfg
        hidden = TransformerEncoder(cfg, name="transformer")(
            input_ids, attention_mask, deterministic)
        hidden = hidden.astype(jnp.float32)

        if cfg.pooling == "cls":
            embeds = hidden[:, 0]
        elif cfg.pooling == "mean":
            mask = attention_mask[:, :, None].astype(jnp.float32)
            embeds = jnp.sum(hidden * mask, axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1), 1e-9)
        elif cfg.pooling == "mean_skip4":
            # TCT-ColBERT: mean over tokens[4:] (modeling_tct.py:19-21)
            mask = attention_mask[:, 4:, None].astype(jnp.float32)
            embeds = jnp.sum(hidden[:, 4:] * mask, axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1), 1e-9)
        else:
            raise NotImplementedError(cfg.pooling)

        if cfg.projection:
            # ANCE embeddingHead + LayerNorm (modeling_ance.py:15-22)
            embeds = nn.Dense(cfg.hidden_size, dtype=jnp.float32,
                              name="projection")(embeds)
            embeds = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                  name="projection_ln")(embeds)

        if self.similarity_metric == "METRIC_COS":
            embeds = embeds / jnp.maximum(
                jnp.linalg.norm(embeds, axis=-1, keepdims=True), 1e-12)
        return embeds
