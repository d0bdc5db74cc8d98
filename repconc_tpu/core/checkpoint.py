"""Model artifact persistence.

The reference nests a raw dense-encoder checkpoint inside the quantizer
checkpoint (pytorch_model.bin + config.json + dense_encoder/, reference:
modeling_repconc.py:118-134). Here a model directory contains:

  repconc_config.json   — RepConcConfig (encoder arch + quantizer hparams)
  params.msgpack        — flax param pytree (encoder + centroids + rotation)
  tokenizer files       — saved HF tokenizer (copied by callers)

Index artifacts (parallel to faiss.write_index + corpus_ids.npy,
reference: run_warmup.py:187-189):

  codes.npy             — (N, M) uint8 PQ codes
  corpus_ids.npy        — (N,) docid strings
  centroids.npy         — (M, K, dsub) float32 (the index's codebook copy)
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from repconc_tpu.core.config import RepConcConfig

PARAMS_NAME = "params.msgpack"


def atomic_np_save(path: str, arr: np.ndarray) -> None:
    """np.save via tmp + rename: eval artifacts (codes.npy is ~0.4 GB at
    8.8M docs) are written by unattended pipeline stages whose skip-if-exists
    caching treats file existence as validity — a partial file from a crash
    mid-write must never satisfy that check."""
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)


def save_params(output_dir: str, params: Any) -> None:
    os.makedirs(output_dir, exist_ok=True)
    params = jax.tree.map(np.asarray, params)
    # atomic: a crash mid-write (worker restart, tunnel death) must never
    # leave a truncated params.msgpack where the previous best/ stood
    path = os.path.join(output_dir, PARAMS_NAME)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(params))
    os.replace(tmp, path)


def load_params(load_dir: str, target: Any = None) -> Any:
    with open(os.path.join(load_dir, PARAMS_NAME), "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def save_model(output_dir: str, config: RepConcConfig, params: Any) -> None:
    config.save(output_dir)
    save_params(output_dir, params)


def load_model(load_dir: str):
    config = RepConcConfig.load(load_dir)
    params = load_params(load_dir)
    return config, params
