"""Offline corpus tokenization into a TokenCache.

The reference hides tokenization inside DataLoader workers at eval time
(evaluate/run_repconc_eval.py:147-153 dataloader_num_workers) — viable on a
many-core host, but on a single-core host large-corpus encoding is
tokenize-bound even with the producer-thread overlap (measured: 180 s
tokenize vs 93 s device per 262k-doc shard at 8.8M-doc scale). This CLI
runs the tokenizer pass offline (any idle CPU window, e.g. while the chip
trains), after which `run_repconc_eval --token_cache_dir` /
`run_dense_eval --token_cache_dir` encode device-bound.

The cache is exact-keyed (corpus fingerprint, tokenizer fingerprint,
clamped max length, text type); a mismatch at encode time falls back to
online tokenization with a warning, never to stale tokens.

Usage:
  python -m repconc_tpu.cli.run_pretokenize \
      --model_name_or_path <model dir>  (tokenizer + position-table clamp) \
      --corpus_path corpus.tsv --max_seq_length 128 \
      --output_dir <ws>/token_cache [--adapter ance]
"""
import argparse
import logging

from repconc_tpu.core.config import RepConcConfig
from repconc_tpu.eval.encode import TokenCache
from repconc_tpu.eval.run_io import load_corpus
from repconc_tpu.models.adapters import load_adapter_tokenizer

logger = logging.getLogger(__name__)


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--corpus_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_seq_length", type=int, default=512)
    p.add_argument("--adapter", default=None)
    p.add_argument("--chunk", type=int, default=8192)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    try:
        config = RepConcConfig.load(args.model_name_or_path)
        limit = (config.encoder.max_position_embeddings
                 - config.encoder.position_offset)
        model_type = config.encoder.model_type
    except (OSError, ValueError):  # raw HF dir (e.g. a dense checkpoint)
        from transformers import AutoConfig

        hf = AutoConfig.from_pretrained(args.model_name_or_path)
        limit = hf.max_position_embeddings - (2 if hf.model_type == "roberta"
                                              else 0)
        model_type = hf.model_type
    tokenizer = load_adapter_tokenizer(args.model_name_or_path,
                                       args.adapter or model_type)

    corpus = load_corpus(args.corpus_path, tokenizer.sep_token)
    # EXACTLY encode_corpus's order (encode.py): longest text first
    corpus_ids = sorted(corpus, key=lambda k: len(corpus[k]), reverse=True)
    texts = [corpus[cid] for cid in corpus_ids]

    # the same clamp encode_texts applies before tokenizing
    max_len = min(args.max_seq_length, limit)

    logger.info("pretokenizing %d docs at max_len %d -> %s",
                len(texts), max_len, args.output_dir)
    TokenCache.build(texts, tokenizer, max_len, args.output_dir,
                     input_text_type="doc", chunk=args.chunk, verbose=True)
    logger.info("token cache written: %s", args.output_dir)


if __name__ == "__main__":
    main()
