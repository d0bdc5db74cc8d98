"""AutoDense equivalent: build a flax DenseEncoder from an HF checkpoint dir.

Replaces the reference's AutoDense.from_pretrained
(models/dense/modeling_dense.py:123-136): reads the HF config.json (with the
stamped `pooling` / `similarity_metric` fields the pipeline relies on), maps
the torch state dict (model.safetensors or pytorch_model.bin) onto the
unified flax TransformerEncoder parameter tree. Supports bert / roberta /
distilbert plus the ANCE (projection head) and TCT (mean_skip4 pooling)
adapter variants.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from repconc_tpu.core.config import EncoderConfig


def encoder_config_from_hf(hf: dict, model_type: Optional[str] = None) -> EncoderConfig:
    """Translate an HF config dict into an EncoderConfig."""
    mt = model_type or hf.get("model_type", "bert")
    if mt == "distilbert":
        cfg = EncoderConfig(
            model_type=mt,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["dim"],
            num_hidden_layers=hf["n_layers"],
            num_attention_heads=hf["n_heads"],
            intermediate_size=hf["hidden_dim"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=0,
            layer_norm_eps=1e-12,
            hidden_act=hf.get("activation", "gelu"),
            position_offset=0,
            pad_token_id=hf.get("pad_token_id", 0),
            hidden_dropout=hf.get("dropout", 0.1),
            attention_dropout=hf.get("attention_dropout", 0.1),
        )
    elif mt in ("bert", "roberta", "ance", "tct"):
        base = "roberta" if mt == "ance" else mt
        pad = hf.get("pad_token_id", 1 if base == "roberta" else 0)
        if pad is None:
            pad = 1 if base == "roberta" else 0
        cfg = EncoderConfig(
            model_type=mt,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=hf.get("type_vocab_size", 2),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
            hidden_act=hf.get("hidden_act", "gelu"),
            position_offset=(pad + 1) if base == "roberta" else 0,
            pad_token_id=pad,
            hidden_dropout=hf.get("hidden_dropout_prob", 0.1),
            attention_dropout=hf.get("attention_probs_dropout_prob", 0.1),
        )
    else:
        raise NotImplementedError(f"model_type {mt}")
    # pipeline-stamped head options (customize_trained_dense.py:62-63)
    if "pooling" in hf:
        cfg.pooling = hf["pooling"]
    if mt == "ance":
        cfg.projection = True
        cfg.pooling = "cls"
    if mt == "tct":
        cfg.pooling = "mean_skip4"
    return cfg


def _load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    import glob as glob_mod

    st_paths = sorted(
        glob_mod.glob(os.path.join(model_dir, "model*.safetensors")))
    if st_paths:
        from safetensors.numpy import load_file

        sd = {}
        for st_path in st_paths:  # single file or HF shard series
            sd.update(load_file(st_path))
        return sd

    pt_paths = sorted(
        glob_mod.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if pt_paths:
        import torch

        sd = {}
        for pt_path in pt_paths:  # single file or HF shard series
            sd.update(torch.load(pt_path, map_location="cpu",
                                 weights_only=True))
        # .numpy() rejects bf16 tensors (common in modern checkpoints)
        return {k: (v.float().numpy() if v.dtype == torch.bfloat16
                    else v.numpy())
                for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights in {model_dir}")


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove the backbone attribute prefix (bert./roberta./distilbert.)."""
    for probe in ("embeddings.word_embeddings.weight",):
        for key in sd:
            if key.endswith(probe):
                prefix = key[: -len(probe)]
                if prefix in ("", "bert.", "roberta.", "distilbert."):
                    if prefix:
                        out = {}
                        for k, v in sd.items():
                            out[k[len(prefix):] if k.startswith(prefix) else k] = v
                        return out
                    return dict(sd)
    return dict(sd)


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T.astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def convert_hf_weights(sd: Dict[str, np.ndarray], cfg: EncoderConfig) -> Dict[str, Any]:
    """Map an HF torch state dict to the flax DenseEncoder param tree."""
    sd = _strip_prefix(sd)
    distil = cfg.model_type == "distilbert"

    t: Dict[str, Any] = {}
    t["word_embeddings"] = {
        "embedding": sd["embeddings.word_embeddings.weight"].astype(np.float32)}
    t["position_embeddings"] = {
        "embedding": sd["embeddings.position_embeddings.weight"].astype(np.float32)}
    if cfg.type_vocab_size > 0:
        t["token_type_embeddings"] = {
            "embedding": sd["embeddings.token_type_embeddings.weight"].astype(np.float32)}
    t["embeddings_ln"] = _ln(sd, "embeddings.LayerNorm")

    for i in range(cfg.num_hidden_layers):
        if distil:
            p = f"transformer.layer.{i}"
            layer = {
                "attention": {
                    "query": _dense(sd, f"{p}.attention.q_lin"),
                    "key": _dense(sd, f"{p}.attention.k_lin"),
                    "value": _dense(sd, f"{p}.attention.v_lin"),
                    "out": _dense(sd, f"{p}.attention.out_lin"),
                },
                "attention_ln": _ln(sd, f"{p}.sa_layer_norm"),
                "mlp_up": _dense(sd, f"{p}.ffn.lin1"),
                "mlp_down": _dense(sd, f"{p}.ffn.lin2"),
                "mlp_ln": _ln(sd, f"{p}.output_layer_norm"),
            }
        else:
            p = f"encoder.layer.{i}"
            layer = {
                "attention": {
                    "query": _dense(sd, f"{p}.attention.self.query"),
                    "key": _dense(sd, f"{p}.attention.self.key"),
                    "value": _dense(sd, f"{p}.attention.self.value"),
                    "out": _dense(sd, f"{p}.attention.output.dense"),
                },
                "attention_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
                "mlp_up": _dense(sd, f"{p}.intermediate.dense"),
                "mlp_down": _dense(sd, f"{p}.output.dense"),
                "mlp_ln": _ln(sd, f"{p}.output.LayerNorm"),
            }
        t[f"layer_{i}"] = layer

    params: Dict[str, Any] = {"transformer": t}
    if cfg.projection:
        # ANCE head keys live OUTSIDE the backbone prefix
        params["projection"] = _dense(sd, "embeddingHead")
        params["projection_ln"] = _ln(sd, "norm")
    return params


def _dense_inv(layer: Dict[str, Any], name: str, out: Dict[str, np.ndarray]):
    # ascontiguousarray: safetensors serializes the raw buffer, so a
    # transposed (F-ordered) view would silently save transposed data
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(layer["kernel"]).T, dtype=np.float32)
    out[f"{name}.bias"] = np.asarray(layer["bias"]).astype(np.float32)


def _ln_inv(layer: Dict[str, Any], name: str, out: Dict[str, np.ndarray]):
    out[f"{name}.weight"] = np.asarray(layer["scale"]).astype(np.float32)
    out[f"{name}.bias"] = np.asarray(layer["bias"]).astype(np.float32)


def export_hf_weights(params: Dict[str, Any], cfg: EncoderConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_hf_weights: flax DenseEncoder params -> HF torch
    state dict (no backbone prefix, the bare-model layout BertModel saves).

    Used to export a TPU-trained dense encoder as a standard HF checkpoint so
    every downstream pipeline stage (and external HF tooling) can consume it —
    the reference's trainers save HF checkpoints natively (SURVEY.md §5)."""
    t = params["transformer"]
    sd: Dict[str, np.ndarray] = {}
    sd["embeddings.word_embeddings.weight"] = np.asarray(
        t["word_embeddings"]["embedding"]).astype(np.float32)
    sd["embeddings.position_embeddings.weight"] = np.asarray(
        t["position_embeddings"]["embedding"]).astype(np.float32)
    if cfg.type_vocab_size > 0:
        sd["embeddings.token_type_embeddings.weight"] = np.asarray(
            t["token_type_embeddings"]["embedding"]).astype(np.float32)
    _ln_inv(t["embeddings_ln"], "embeddings.LayerNorm", sd)

    distil = cfg.model_type == "distilbert"
    for i in range(cfg.num_hidden_layers):
        layer = t[f"layer_{i}"]
        if distil:
            p = f"transformer.layer.{i}"
            _dense_inv(layer["attention"]["query"], f"{p}.attention.q_lin", sd)
            _dense_inv(layer["attention"]["key"], f"{p}.attention.k_lin", sd)
            _dense_inv(layer["attention"]["value"], f"{p}.attention.v_lin", sd)
            _dense_inv(layer["attention"]["out"], f"{p}.attention.out_lin", sd)
            _ln_inv(layer["attention_ln"], f"{p}.sa_layer_norm", sd)
            _dense_inv(layer["mlp_up"], f"{p}.ffn.lin1", sd)
            _dense_inv(layer["mlp_down"], f"{p}.ffn.lin2", sd)
            _ln_inv(layer["mlp_ln"], f"{p}.output_layer_norm", sd)
        else:
            p = f"encoder.layer.{i}"
            _dense_inv(layer["attention"]["query"], f"{p}.attention.self.query", sd)
            _dense_inv(layer["attention"]["key"], f"{p}.attention.self.key", sd)
            _dense_inv(layer["attention"]["value"], f"{p}.attention.self.value", sd)
            _dense_inv(layer["attention"]["out"], f"{p}.attention.output.dense", sd)
            _ln_inv(layer["attention_ln"], f"{p}.attention.output.LayerNorm", sd)
            _dense_inv(layer["mlp_up"], f"{p}.intermediate.dense", sd)
            _dense_inv(layer["mlp_down"], f"{p}.output.dense", sd)
            _ln_inv(layer["mlp_ln"], f"{p}.output.LayerNorm", sd)

    if cfg.projection:
        _dense_inv(params["projection"], "embeddingHead", sd)
        _ln_inv(params["projection_ln"], "norm", sd)
    return sd


def save_hf_checkpoint(output_dir: str, src_model_dir: str,
                       encoder_params: Dict[str, Any], cfg: EncoderConfig,
                       similarity_metric: Optional[str] = None) -> None:
    """Write an HF-format checkpoint dir: src's config.json + tokenizer files
    plus model.safetensors holding `encoder_params` (exported torch layout)."""
    import shutil

    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    sd = export_hf_weights(encoder_params, cfg)
    save_file(sd, os.path.join(output_dir, "model.safetensors"))
    for name in os.listdir(src_model_dir):
        if name in ("model.safetensors", "pytorch_model.bin") or \
                name.startswith(("checkpoint", "pytorch_model-",
                                 "model-")):
            continue
        s = os.path.join(src_model_dir, name)
        if os.path.isfile(s):
            shutil.copy(s, os.path.join(output_dir, name))
    # stamp the pooling/metric ACTUALLY used (the reference's customize
    # contract, customize_trained_dense.py:62-63): a verbatim source config
    # would silently load with the wrong pooling downstream
    cfg_path = os.path.join(output_dir, "config.json")
    with open(cfg_path) as f:
        hf = json.load(f)
    hf["pooling"] = cfg.pooling
    if similarity_metric is not None:
        hf["similarity_metric"] = similarity_metric
    with open(cfg_path, "w") as f:
        json.dump(hf, f, indent=2)


def load_dense_encoder(
    model_dir: str, adapter: Optional[str] = None
) -> Tuple[EncoderConfig, Dict[str, Any], str]:
    """Load (EncoderConfig, flax params, similarity_metric) from an HF dir.

    `adapter` forces a custom-model architecture variant (e.g. "ance", "tct")
    regardless of the checkpoint's declared model_type — real ANCE/TCT
    checkpoints declare plain roberta/bert (reference handles this with
    separate encoder classes, examples/ance/modeling_ance.py:12)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = encoder_config_from_hf(hf, model_type=adapter)
    sd = _load_state_dict(model_dir)
    params = convert_hf_weights(sd, cfg)
    metric = hf.get("similarity_metric", "METRIC_IP")
    return cfg, params, metric
