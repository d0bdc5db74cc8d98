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


# ---------------------------------------------------------------------------
# Offline tokenization cache (TokenCache / cli.run_pretokenize): moves the
# tokenizer pass off the encode critical path. On the 1-core bench host the
# 8.8M-doc encode is tokenize-bound (180 s tokenize vs 93 s device per
# shard); with precomputed tokens encode is device-bound. The reference has
# no offline equivalent — it hides the cost in DataLoader workers
# (evaluate_repconc.py:147-153), which needs a many-core host.
# ---------------------------------------------------------------------------

def test_token_cache_batches_bit_identical(tiny_model, corpus, tmp_path):
    """Cache slices must reproduce tokenize_batch() EXACTLY for every batch
    position, including the copy-padded tail — same ids, same mask."""
    from repconc_tpu.eval.encode import TokenCache, tokenize_batch

    _, _, tok = tiny_model
    texts = [corpus[k] for k in
             sorted(corpus, key=lambda k: len(corpus[k]), reverse=True)]
    cache = TokenCache.build(texts, tok, 16, str(tmp_path / "tc"), chunk=7)
    n, bs = len(texts), 16
    for start in range(0, n, bs):
        batch = list(texts[start:start + bs])
        real = len(batch)
        if real < bs:
            batch = batch + [batch[-1]] * (bs - real)
        ref_ids, ref_mask = tokenize_batch(tok, batch, 16, "doc")
        got_ids, got_mask = cache.batch(start, bs, n)
        np.testing.assert_array_equal(got_ids, ref_ids)
        np.testing.assert_array_equal(got_mask, ref_mask)


def test_token_cache_sharded_slices(tiny_model, corpus, tmp_path):
    """slice() views must line up with encode_corpus's shard windows."""
    from repconc_tpu.eval.encode import TokenCache, tokenize_batch

    _, _, tok = tiny_model
    texts = [corpus[k] for k in
             sorted(corpus, key=lambda k: len(corpus[k]), reverse=True)]
    cache = TokenCache.build(texts, tok, 16, str(tmp_path / "tc"))
    shard = cache.slice(32, 64)
    sub = texts[32:64]
    ref_ids, ref_mask = tokenize_batch(tok, sub[5:13], 16, "doc")
    got_ids, got_mask = shard.batch(5, 8, len(sub))
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_array_equal(got_mask, ref_mask)


def test_encode_corpus_with_token_cache_matches(tiny_model, corpus, tmp_path):
    from repconc_tpu.eval.encode import TokenCache

    config, params, tok = tiny_model
    texts = [corpus[k] for k in
             sorted(corpus, key=lambda k: len(corpus[k]), reverse=True)]
    tc_dir = str(tmp_path / "tc")
    TokenCache.build(texts, tok, 16, tc_dir)
    ref, ref_ids = encode_corpus(corpus, config, params, tok,
                                 max_seq_length=16, batch_size=16,
                                 output="continuous_embedding")
    out, ids = encode_corpus(corpus, config, params, tok,
                             max_seq_length=16, batch_size=16,
                             output="continuous_embedding",
                             cache_dir=str(tmp_path / "shards"), shard_size=32,
                             token_cache_dir=tc_dir)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_stale_token_cache_falls_back(tiny_model, corpus, tmp_path, caplog):
    """A cache built for a DIFFERENT corpus/length must be ignored (warning +
    online tokenization), never silently used."""
    import logging

    from repconc_tpu.eval.encode import TokenCache

    config, params, tok = tiny_model
    texts = [corpus[k] for k in
             sorted(corpus, key=lambda k: len(corpus[k]), reverse=True)]
    tc_dir = str(tmp_path / "tc")
    TokenCache.build(texts[:50], tok, 16, tc_dir)  # wrong corpus subset
    ref, _ = encode_corpus(corpus, config, params, tok, max_seq_length=16,
                           batch_size=16, output="continuous_embedding")
    with caplog.at_level(logging.WARNING):
        out, _ = encode_corpus(corpus, config, params, tok, max_seq_length=16,
                               batch_size=16, output="continuous_embedding",
                               token_cache_dir=tc_dir)
    assert any("stale" in r.message for r in caplog.records)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_pretokenize_cli_roundtrip(tiny_model, corpus, tmp_path):
    """The CLI must replicate the eval CLIs' corpus loading + sort order so
    its cache hits at encode time (exercises the raw-HF-dir config fallback
    and load_corpus's title[SEP]body concat)."""
    from repconc_tpu.cli import run_pretokenize
    from repconc_tpu.eval.encode import TokenCache
    from repconc_tpu.eval.run_io import load_corpus

    config, params, tok = tiny_model
    rng = np.random.default_rng(9)
    corpus_path = tmp_path / "corpus.tsv"
    with open(corpus_path, "w") as f:
        for i in range(60):
            title = " ".join(rng.choice(WORDS, size=2))
            body = " ".join(rng.choice(WORDS, size=int(rng.integers(3, 12))))
            f.write(f"d{i}\t{title}\t{body}\n")
    # the tiny_model fixture saved the raw HF dir next to the tokenizer;
    # recover it from the tokenizer itself
    model_dir = tok.name_or_path
    tc_dir = str(tmp_path / "tc")
    run_pretokenize.main(["--model_name_or_path", model_dir,
                          "--corpus_path", str(corpus_path),
                          "--output_dir", tc_dir,
                          "--max_seq_length", "16", "--chunk", "17"])
    loaded = load_corpus(str(corpus_path), tok.sep_token)
    sorted_texts = [loaded[k] for k in
                    sorted(loaded, key=lambda k: len(loaded[k]), reverse=True)]
    hit = TokenCache.open(tc_dir, sorted_texts, tok, 16, "doc")
    assert hit is not None
    out, _ = encode_corpus(loaded, config, params, tok, max_seq_length=16,
                           batch_size=16, output="continuous_embedding",
                           token_cache_dir=tc_dir)
    ref, _ = encode_corpus(loaded, config, params, tok, max_seq_length=16,
                           batch_size=16, output="continuous_embedding")
    np.testing.assert_allclose(out, ref, rtol=1e-6)
