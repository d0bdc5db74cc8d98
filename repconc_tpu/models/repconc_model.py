"""The RepCONC model: dense encoder + OPQ rotation + PQ codebook head.

Functional equivalent of the reference torch module
(models/repconc/modeling_repconc.py:28-134). Parameters live in one pytree:

    {"encoder": <DenseEncoder params>,
     "rotation": (D, D) float32,          # applied as embeds @ rotation.T
     "centroids": (M, K, dsub) float32}

The forward is a pure function over (config, params, batch); quantize/decode
compose from repconc_tpu.quant. Persistence is repconc_config.json +
params.msgpack via core.checkpoint (tokenizer files are copied alongside by
the CLIs), mirroring the reference's nested dense_encoder/ checkpoint layout
contract at the directory level.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from repconc_tpu.core import checkpoint
from repconc_tpu.core.config import METRIC_CENTROID_COS, RepConcConfig
from repconc_tpu.models.auto import load_dense_encoder
from repconc_tpu.models.transformer import DenseEncoder
from repconc_tpu.quant import codebook


class QuantizeOutput(NamedTuple):
    """Mirrors the reference's QuantizeOutput (modeling_repconc.py:21-25)."""

    continuous_embeds: jnp.ndarray
    quantized_embeds: Optional[jnp.ndarray] = None
    discrete_codes: Optional[jnp.ndarray] = None


def init_params(
    config: RepConcConfig, key: jax.Array, encoder_params: Optional[Dict] = None
) -> Dict[str, Any]:
    """Fresh parameter tree: identity rotation, random centroids
    (reference: modeling_repconc.py:40-44)."""
    k_enc, k_cent = jax.random.split(key)
    if encoder_params is None:
        module = DenseEncoder(config.encoder, config.similarity_metric)
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        encoder_params = module.init(k_enc, dummy, jnp.ones((1, 8), jnp.int32))["params"]
    centroids = jax.random.normal(
        k_cent, (config.MCQ_M, config.MCQ_K, config.dsub), dtype=jnp.float32)
    if config.similarity_metric == METRIC_CENTROID_COS:
        centroids = codebook.normalize_centroids(centroids)
    return {
        "encoder": encoder_params,
        "rotation": jnp.eye(config.hidden_size, dtype=jnp.float32),
        "centroids": centroids,
    }


def encode_continuous(
    config: RepConcConfig,
    params: Dict[str, Any],
    input_ids,
    attention_mask,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Dense encode -> rotate -> (per-subvector normalize for CENTROID_COS).

    Reference forward up to the quantizer (modeling_repconc.py:94-100)."""
    module = DenseEncoder(config.encoder, config.similarity_metric)
    rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
    embeds = module.apply({"params": params["encoder"]}, input_ids, attention_mask,
                          deterministic=not train, rngs=rngs)
    rotated = jnp.dot(embeds, params["rotation"].T,
                      precision=jax.lax.Precision.HIGHEST)
    if config.similarity_metric == METRIC_CENTROID_COS:
        rotated = codebook.normalize_subvectors(rotated, config.MCQ_M)
    return rotated


def forward(
    config: RepConcConfig,
    params: Dict[str, Any],
    input_ids,
    attention_mask,
    discrete_codes: Optional[jnp.ndarray] = None,
    return_code: bool = False,
    return_quantized_embedding: bool = False,
    use_constraint: bool = False,
    axis_name: Optional[str] = None,
) -> QuantizeOutput:
    """Full RepCONC forward (reference: modeling_repconc.py:87-110)."""
    rotated = encode_continuous(config, params, input_ids, attention_mask)
    if discrete_codes is None and (return_code or return_quantized_embedding):
        discrete_codes = codebook.encode(
            rotated, params["centroids"],
            use_constraint=use_constraint,
            sk_epsilon=config.sk_epsilon,
            sk_iters=config.sk_iters,
            axis_name=axis_name,
        )
    quantized = (codebook.decode(discrete_codes, params["centroids"])
                 if return_quantized_embedding else None)
    return QuantizeOutput(rotated, quantized, discrete_codes)


def save_pretrained(output_dir: str, config: RepConcConfig, params: Dict[str, Any],
                    tokenizer_dir: Optional[str] = None) -> None:
    checkpoint.save_model(output_dir, config, params)
    if tokenizer_dir and os.path.isdir(tokenizer_dir):
        for name in ("tokenizer.json", "tokenizer_config.json", "vocab.txt",
                     "vocab.json", "merges.txt", "special_tokens_map.json"):
            src = os.path.join(tokenizer_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(output_dir, name))


def from_pretrained(load_dir: str):
    """Load (config, params) from a repconc_tpu model dir."""
    return checkpoint.load_model(load_dir)


def from_dense_encoder(
    model_dir: str,
    MCQ_M: int,
    MCQ_K: int = 256,
    similarity_metric: Optional[str] = None,
    pooling: Optional[str] = None,
    sk_epsilon: float = 0.003,
    sk_iters: int = 100,
    key: Optional[jax.Array] = None,
    adapter: Optional[str] = None,
):
    """Build a fresh RepCONC model around an HF dense-encoder checkpoint
    (reference: run_warmup.py:156-174)."""
    enc_cfg, enc_params, metric = load_dense_encoder(model_dir, adapter=adapter)
    if pooling is not None:
        enc_cfg.pooling = pooling
    config = RepConcConfig(
        encoder=enc_cfg,
        MCQ_M=MCQ_M,
        MCQ_K=MCQ_K,
        similarity_metric=similarity_metric or metric,
        sk_epsilon=sk_epsilon,
        sk_iters=sk_iters,
    )
    if key is None:
        key = jax.random.key(2022)
    params = init_params(config, key, encoder_params=enc_params)
    return config, params
