"""Shard-resumable corpus encoding (eval/encode.py cache_dir).

The reference's eval caches only the FINAL codes file
(evaluate_repconc.py:109-119); a killed encode loses all progress. Here the
encode loop flushes per-shard artifacts so a worker crash / tunnel death
resumes from the last complete shard. These tests pin the contract:
identical output, true resume (cached shards are trusted, not re-encoded),
and stale-cache invalidation when settings change.
"""
import os

import numpy as np
import pytest

pytest.importorskip("torch")

from repconc_tpu.eval.encode import clear_encode_cache, encode_corpus
from repconc_tpu.models import repconc_model

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    import torch
    from transformers import AutoTokenizer, BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(11)
    d = tmp_path_factory.mktemp("tiny_bert_resume")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt"),
                      do_lower_case=True).save_pretrained(d)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, pad_token_id=0)
    cfg.pooling = "mean"
    BertModel(cfg, add_pooling_layer=False).save_pretrained(d)
    config, params = repconc_model.from_dense_encoder(str(d), MCQ_M=8, MCQ_K=32)
    return config, params, AutoTokenizer.from_pretrained(str(d))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    return {f"d{i}": " ".join(rng.choice(WORDS, size=int(rng.integers(3, 12))))
            for i in range(100)}


def test_sharded_encode_matches_unsharded(tiny_model, corpus, tmp_path):
    config, params, tok = tiny_model
    ref, ref_ids = encode_corpus(corpus, config, params, tok,
                                 max_seq_length=16, batch_size=16,
                                 output="continuous_embedding")
    cache = str(tmp_path / "shards")
    out, ids = encode_corpus(corpus, config, params, tok,
                             max_seq_length=16, batch_size=16,
                             output="continuous_embedding",
                             cache_dir=cache, shard_size=32)
    assert (ids == ref_ids).all()
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    shards = sorted(f for f in os.listdir(cache) if f.startswith("shard_"))
    assert shards == [f"shard_{i:06d}.npy" for i in range(4)]  # ceil(100/32)


def test_resume_trusts_complete_shards(tiny_model, corpus, tmp_path):
    config, params, tok = tiny_model
    cache = str(tmp_path / "shards")
    kw = dict(max_seq_length=16, batch_size=16,
              output="continuous_embedding", cache_dir=cache, shard_size=32)
    encode_corpus(corpus, config, params, tok, **kw)
    # simulate "resumed after crash": tamper shard 0 — if the rerun trusts
    # the shard (no re-encode), the sentinel shows up in the output
    sentinel = np.full((32, config.encoder.hidden_size), 7.0, np.float32)
    np.save(os.path.join(cache, "shard_000000.npy"), sentinel)
    # drop a later shard: only IT should be re-encoded
    os.remove(os.path.join(cache, "shard_000002.npy"))
    out, _ = encode_corpus(corpus, config, params, tok, **kw)
    np.testing.assert_array_equal(out[:32], sentinel)
    ref, _ = encode_corpus(corpus, config, params, tok,
                           max_seq_length=16, batch_size=16,
                           output="continuous_embedding")
    np.testing.assert_allclose(out[64:96], ref[64:96], rtol=1e-6)


def test_settings_change_invalidates_cache(tiny_model, corpus, tmp_path):
    config, params, tok = tiny_model
    cache = str(tmp_path / "shards")
    kw = dict(batch_size=16, output="continuous_embedding",
              cache_dir=cache, shard_size=32)
    encode_corpus(corpus, config, params, tok, max_seq_length=16, **kw)
    np.save(os.path.join(cache, "shard_000000.npy"),
            np.zeros((32, config.encoder.hidden_size), np.float32))
    # different max_seq_length -> meta mismatch -> tampered shard is wiped
    out, _ = encode_corpus(corpus, config, params, tok, max_seq_length=24, **kw)
    ref, _ = encode_corpus(corpus, config, params, tok, max_seq_length=24,
                           batch_size=16, output="continuous_embedding")
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_model_or_corpus_change_invalidates_cache(tiny_model, corpus,
                                                  tmp_path):
    """Shards from a different checkpoint or an edited corpus must never be
    reused: n/first_id/last_id can all collide, so the meta key carries
    params + corpus content fingerprints."""
    import jax

    config, params, tok = tiny_model
    cache = str(tmp_path / "shards")
    kw = dict(max_seq_length=16, batch_size=16,
              output="continuous_embedding", cache_dir=cache, shard_size=32)
    encode_corpus(corpus, config, params, tok, **kw)
    poison = np.full((32, config.encoder.hidden_size), 7.0, np.float32)
    np.save(os.path.join(cache, "shard_000000.npy"), poison)

    # different model, same corpus/settings -> cache wiped, no poison
    params2 = jax.tree.map(lambda a: a * 1.01, params)
    out, _ = encode_corpus(corpus, config, params2, tok, **kw)
    assert not np.allclose(out[:32], poison)

    # edit ONE middle doc's text keeping its length (n, boundary ids, and
    # length-sort order all unchanged) -> still invalidated
    np.save(os.path.join(cache, "shard_000000.npy"), poison)
    corpus2 = dict(corpus)
    mid = sorted(corpus2, key=lambda k: len(corpus2[k]), reverse=True)[50]
    corpus2[mid] = corpus2[mid][:-1] + ("x" if corpus2[mid][-1] != "x" else "y")
    out2, _ = encode_corpus(corpus2, config, params2, tok, **kw)
    assert not np.allclose(out2[:32], poison)


def test_clear_encode_cache(tiny_model, corpus, tmp_path):
    config, params, tok = tiny_model
    cache = str(tmp_path / "shards")
    encode_corpus(corpus, config, params, tok, max_seq_length=16,
                  batch_size=16, output="code", cache_dir=cache, shard_size=64)
    clear_encode_cache(cache)
    assert not os.path.exists(cache)
    clear_encode_cache(cache)  # idempotent
    clear_encode_cache(None)


def test_encode_empty_inputs(tiny_model):
    """An empty corpus/query dict returns a correctly-shaped empty array
    (uint8 (0, M) codes / fp32 (0, D) embeds) instead of np.concatenate([])
    exploding three layers down."""
    from repconc_tpu.eval.encode import encode_queries

    config, params, tokenizer = tiny_model
    codes, ids = encode_corpus({}, config, params, tokenizer, 32,
                               batch_size=8, output="code")
    assert codes.shape == (0, config.MCQ_M) and codes.dtype == np.uint8
    assert len(ids) == 0
    emb, qids = encode_queries({}, config, params, tokenizer, 32, batch_size=8)
    assert emb.shape == (0, config.encoder.hidden_size)
    assert emb.dtype == np.float32 and len(qids) == 0
