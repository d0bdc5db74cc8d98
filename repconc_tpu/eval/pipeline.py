"""End-to-end evaluation pipeline: encode -> search -> TREC metrics.

Shared by in-training validation (finetune_repconc.py:530-577 equivalent)
and the eval CLIs (run_repconc_eval.py / run_dense_eval.py equivalents).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

from repconc_tpu.core.config import RepConcConfig
from repconc_tpu.eval.encode import encode_corpus, encode_queries
from repconc_tpu.eval.trec import evaluate_run
from repconc_tpu.index.adc import batch_adc_search

logger = logging.getLogger(__name__)


def run_from_topk(query_ids, all_scores, all_ids) -> Dict[str, Dict[str, float]]:
    """Non-finite scores are -inf pad sentinels (short IVF candidate sets,
    ivf.py/pallas_ivf.py) — dropped, never ranked."""
    return {str(q): {str(d): float(s) for d, s in zip(dids, scs)
                     if np.isfinite(s)}
            for q, dids, scs in zip(query_ids, all_ids, all_scores)}


def repconc_retrieval(
    config: RepConcConfig,
    params,
    tokenizer,
    corpus: Dict[Any, str],
    queries: Dict[Any, str],
    max_seq_length: int = 512,
    topk: int = 1000,
    encode_batch: int = 256,
    search_batch: int = 1200,
    codes: Optional[np.ndarray] = None,
    corpus_ids: Optional[np.ndarray] = None,
) -> Tuple[Dict, np.ndarray, np.ndarray, np.ndarray]:
    """Quantized retrieval: encode corpus to codes (argmin, no constraint —
    reference sets use_constraint=False for inference), queries to fp32
    embeds, ADC search. Returns (run, codes, corpus_ids, query_ids)."""
    if codes is None or corpus_ids is None:
        codes, corpus_ids = encode_corpus(
            corpus, config, params, tokenizer, max_seq_length,
            batch_size=encode_batch, output="code")
    q_embeds, query_ids = encode_queries(
        queries, config, params, tokenizer, max_seq_length,
        batch_size=encode_batch)
    scores, ids = batch_adc_search(
        query_ids, q_embeds, corpus_ids, codes,
        np.asarray(params["centroids"]), topk=topk, batch_size=search_batch)
    return run_from_topk(query_ids, scores, ids), codes, corpus_ids, query_ids


def evaluate_dense_model(
    config: RepConcConfig,
    params,
    tokenizer,
    corpus: Dict[Any, str],
    queries: Dict[Any, str],
    qrels: Dict[str, Dict[str, int]],
    max_seq_length: int = 512,
    topk: int = 10,
    encode_batch: int = 256,
    k_values=(10,),
    mrr_k_values=(10,),
) -> Dict[str, float]:
    """Uncompressed in-training validation: encode corpus + queries to fp32
    embeddings, exact flat-IP search, TREC metrics. Used by the dense
    pre-training stage (stage 0), where quantized eval would be meaningless
    (centroids are untrained). Reference analog: evaluate_dense.py:92-129."""
    from repconc_tpu.index.flat import batch_flat_search

    c_embeds, corpus_ids = encode_corpus(
        corpus, config, params, tokenizer, max_seq_length,
        batch_size=encode_batch, output="continuous_embedding")
    q_embeds, query_ids = encode_queries(
        queries, config, params, tokenizer, max_seq_length,
        batch_size=encode_batch)
    scores, ids = batch_flat_search(
        query_ids, q_embeds, corpus_ids, c_embeds, topk=topk)
    run = run_from_topk(query_ids, scores, ids)
    return _flat_metrics(qrels, run, k_values, mrr_k_values)


def _flat_metrics(qrels, run, k_values, mrr_k_values) -> Dict[str, float]:
    """Flat {"MRR@10": ...} dict for in-training validation logs."""
    metrics = evaluate_run(qrels, run, k_values=k_values,
                           mrr_k_values=mrr_k_values)
    flat: Dict[str, float] = {}
    for cat, d in metrics.items():
        if cat != "perquery":
            flat.update(d)
    return flat


def evaluate_repconc_model(
    config: RepConcConfig,
    params,
    tokenizer,
    corpus: Dict[Any, str],
    queries: Dict[Any, str],
    qrels: Dict[str, Dict[str, int]],
    max_seq_length: int = 512,
    topk: int = 10,
    encode_batch: int = 256,
    k_values=(10,),
    mrr_k_values=(10,),
) -> Dict[str, float]:
    """In-training validation metric dict (flat key space, like the
    reference's evaluate(): {"MRR@10": ..., "NDCG@10": ...})."""
    run, *_ = repconc_retrieval(
        config, params, tokenizer, corpus, queries,
        max_seq_length=max_seq_length, topk=topk, encode_batch=encode_batch)
    return _flat_metrics(qrels, run, k_values, mrr_k_values)
