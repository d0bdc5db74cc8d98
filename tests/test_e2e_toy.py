"""End-to-end toy pipeline: texts -> dense encode -> OPQ warmup -> ADC search
-> TREC metrics. Mechanics + self-retrieval sanity on a tiny random model.
"""
import os

import numpy as np
import pytest

pytest.importorskip("torch")
import jax

from repconc_tpu.core.config import RepConcConfig
from repconc_tpu.eval import evaluate_run, write_run_tsv
from repconc_tpu.eval.encode import encode_corpus, encode_queries, encode_texts
from repconc_tpu.index.adc import batch_adc_search
from repconc_tpu.index.flat import batch_flat_search
from repconc_tpu.models import repconc_model
from repconc_tpu.train.warmup import warmup_from_embeds

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizerFast

    import torch

    torch.manual_seed(7)  # isolate from torch RNG consumed by other tests
    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)
    tok.save_pretrained(d)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, pad_token_id=0)
    cfg.pooling = "mean"
    # cosine so exact-duplicate queries provably rank their doc first
    cfg.similarity_metric = "METRIC_COS"
    BertModel(cfg, add_pooling_layer=False).save_pretrained(d)
    return str(d)


def make_corpus(rng, n=200):
    corpus = {}
    for i in range(n):
        length = rng.integers(3, 12)
        corpus[f"d{i}"] = " ".join(rng.choice(WORDS, size=length))
    return corpus


def test_pipeline_end_to_end(tiny_hf_dir, rng, tmp_path):
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tiny_hf_dir)
    config, params = repconc_model.from_dense_encoder(
        tiny_hf_dir, MCQ_M=8, MCQ_K=32)
    assert config.encoder.pooling == "mean"

    corpus = make_corpus(rng)
    # queries are exact copies of some docs -> self-retrieval must succeed
    qids = [f"q{i}" for i in range(20)]
    target_docs = [f"d{i * 7}" for i in range(20)]
    queries = {q: corpus[d] for q, d in zip(qids, target_docs)}
    qrels = {q: {d: 1} for q, d in zip(qids, target_docs)}

    # stage: dense corpus embeddings
    embeds, corpus_ids = encode_corpus(
        corpus, config, params, tokenizer, max_seq_length=32,
        batch_size=32, output="continuous_embedding")
    assert embeds.shape == (200, 32) and embeds.dtype == np.float32

    # self-retrieval with FLAT search is exact by construction
    q_embeds, query_ids = encode_queries(queries, config, params, tokenizer,
                                         max_seq_length=32, batch_size=32)
    s, ids = batch_flat_search(query_ids, q_embeds, corpus_ids, embeds,
                               topk=10, batch_size=8)
    run = {q: dict(zip(map(str, dids), map(float, scs)))
           for q, dids, scs in zip(query_ids, ids, s)}
    flat_metrics = evaluate_run(qrels, run, k_values=(1, 10), mrr_k_values=(10,))
    assert flat_metrics["recall"]["Recall@10"] == 1.0  # exact text match

    # stage: OPQ warmup from the dense embeddings
    params2, codes = warmup_from_embeds(
        embeds, config, params, outer_iters=5, pq_iters=2, final_pq_iters=8)
    assert codes.shape == (200, 8) and codes.dtype == np.uint8
    rot = np.asarray(params2["rotation"])
    np.testing.assert_allclose(rot @ rot.T, np.eye(32), atol=1e-3)

    # stage: re-encode corpus through the warmed model -> same codes
    codes2, corpus_ids2 = encode_corpus(
        corpus, config, params2, tokenizer, max_seq_length=32,
        batch_size=32, output="code")
    np.testing.assert_array_equal(corpus_ids, corpus_ids2)
    agreement = (codes == codes2).mean()
    assert agreement > 0.99, agreement  # identical modulo fp noise at boundaries

    # stage: ADC search + metrics; quantized self-retrieval should mostly work
    q_embeds2, _ = encode_queries(queries, config, params2, tokenizer,
                                  max_seq_length=32, batch_size=32)
    s, ids = batch_adc_search(query_ids, q_embeds2, corpus_ids, codes,
                              np.asarray(params2["centroids"]),
                              topk=10, batch_size=8)
    run = {q: dict(zip(map(str, dids), map(float, scs)))
           for q, dids, scs in zip(query_ids, ids, s)}
    out_run = tmp_path / "run.tsv"
    write_run_tsv(str(out_run), query_ids, s, ids)
    metrics = evaluate_run(qrels, str(out_run), k_values=(1, 10), mrr_k_values=(10,))
    assert metrics["recall"]["Recall@10"] >= 0.8, metrics["recall"]
    assert metrics["mrr"]["MRR@10"] >= 0.5, metrics["mrr"]


def test_encode_texts_batch_padding_consistency(tiny_hf_dir, rng):
    """Padding the last partial batch must not change results."""
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tiny_hf_dir)
    config, params = repconc_model.from_dense_encoder(tiny_hf_dir, MCQ_M=4, MCQ_K=16)
    texts = [" ".join(rng.choice(WORDS, size=5)) for _ in range(10)]
    full = encode_texts(texts, config, params, tokenizer, 32, batch_size=10)
    ragged = encode_texts(texts, config, params, tokenizer, 32, batch_size=4)
    np.testing.assert_allclose(full, ragged, rtol=1e-4, atol=1e-5)
