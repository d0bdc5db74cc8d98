"""Dense (uncompressed) retrieval baseline: encode corpus + queries, flat-IP
search, TREC metrics. Pipeline stage 3 (reference: evaluate/run_dense_eval.py).

Artifacts are cached skip-if-exists so the stage is resumable; corpus
embeddings feed the OPQ warmup and hard-negative mining.
"""
from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

from repconc_tpu.core.logging_utils import setup_logging
from repconc_tpu.eval import (
    evaluate_run, load_beir_corpus, load_beir_qrels, load_beir_queries,
    load_corpus, load_queries, write_run_tsv,
)
from repconc_tpu.eval.encode import (clear_encode_cache, encode_corpus,
                                     encode_queries)
from repconc_tpu.index.flat import batch_flat_search

logger = logging.getLogger(__name__)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name_or_path", required=True)
    parser.add_argument("--corpus_path", required=True)
    parser.add_argument("--query_path", required=True)
    parser.add_argument("--qrel_path", default=None)
    parser.add_argument("--out_corpus_dir", required=True)
    parser.add_argument("--out_query_dir", required=True)
    parser.add_argument("--data_format", default="msmarco",
                        choices=["msmarco", "beir"])
    parser.add_argument("--max_seq_length", type=int, default=512)
    parser.add_argument("--similarity_metric", default=None)
    parser.add_argument("--pooling", default=None)
    parser.add_argument("--per_device_eval_batch_size", type=int, default=256)
    parser.add_argument("--token_cache_dir", default=None,
                        help="offline corpus tokens from run_pretokenize; "
                        "ignored (with a warning) unless it exactly matches "
                        "the corpus/tokenizer/length")
    parser.add_argument("--relevance_level", type=int, default=1,
                        help="minimum qrel grade counted relevant for the "
                             "binary metrics (TREC DL graded qrels use 2; "
                             "reference eval_utils.py:149 parameter, here "
                             "on the CLI)")
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--search_batch", type=int, default=1200)
    parser.add_argument("--adapter", default=None,
                        help="custom model adapter (e.g. ance, tct)")
    parser.add_argument("--save_corpus_embed", action="store_true")
    parser.add_argument("--save_query_embed", action="store_true")
    parser.add_argument("--data_parallel", action="store_true",
                        help="encode over all devices (batch dp-sharded) and "
                             "search with the corpus sharded over the mesh")
    return parser


def load_model(args):
    from repconc_tpu.core.config import RepConcConfig
    from repconc_tpu.models.adapters import load_adapter_tokenizer
    from repconc_tpu.models.auto import load_dense_encoder
    from repconc_tpu.models import repconc_model
    import jax

    tokenizer = load_adapter_tokenizer(args.model_name_or_path, args.adapter)
    enc_cfg, enc_params, metric = load_dense_encoder(args.model_name_or_path,
                                                     adapter=args.adapter)
    if args.pooling:
        enc_cfg.pooling = args.pooling
    if args.similarity_metric:
        metric = args.similarity_metric
    # dense eval: wrap in a RepConcConfig with identity rotation (M=1 would
    # constrain hidden%M; use M such that it divides -- rotation is identity
    # and no quantization is used, so M is irrelevant; pick a divisor)
    M = 1
    config = RepConcConfig(encoder=enc_cfg, MCQ_M=M, MCQ_K=2,
                           similarity_metric=metric
                           if metric != "METRIC_CENTROID_COS" else "METRIC_IP")
    params = repconc_model.init_params(config, jax.random.key(0),
                                       encoder_params=enc_params)
    return config, params, tokenizer


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()

    config, params, tokenizer = load_model(args)

    mesh = None
    if args.data_parallel:
        from repconc_tpu.core.mesh import create_mesh

        mesh = create_mesh()
        logger.info("data-parallel eval mesh over %d devices", mesh.size)

    if args.data_format == "msmarco":
        corpus_loader = lambda p: load_corpus(p, tokenizer.sep_token)
        query_loader = load_queries
    else:
        corpus_loader = load_beir_corpus
        query_loader = load_beir_queries

    # corpus embeddings (cached)
    emb_path = os.path.join(args.out_corpus_dir, "corpus_embeds.npy")
    ids_path = os.path.join(args.out_corpus_dir, "corpus_ids.npy")
    if os.path.exists(emb_path) and os.path.exists(ids_path):
        logger.info("Load pre-computed corpus representations")
        corpus_embeds, corpus_ids = np.load(emb_path), np.load(ids_path)
    else:
        corpus = corpus_loader(args.corpus_path)
        shard_cache = os.path.join(args.out_corpus_dir, "encode_shards")
        corpus_embeds, corpus_ids = encode_corpus(
            corpus, config, params, tokenizer, args.max_seq_length,
            batch_size=args.per_device_eval_batch_size,
            output="continuous_embedding", mesh=mesh, cache_dir=shard_cache,
            token_cache_dir=args.token_cache_dir)
        if args.save_corpus_embed:
            os.makedirs(args.out_corpus_dir, exist_ok=True)
            from repconc_tpu.core.checkpoint import atomic_np_save
            atomic_np_save(emb_path, corpus_embeds)
            atomic_np_save(ids_path, corpus_ids)
            clear_encode_cache(shard_cache)
        # without save_corpus_embed the shards ARE the cache: a rerun
        # resumes from them (meta.json invalidates on any setting change)

    # query embeddings (cached)
    qemb_path = os.path.join(args.out_query_dir, "query_embeds.npy")
    qids_path = os.path.join(args.out_query_dir, "qids.npy")
    if os.path.exists(qemb_path) and os.path.exists(qids_path):
        logger.info("Load pre-computed query representations")
        query_embeds, query_ids = np.load(qemb_path), np.load(qids_path)
    else:
        queries = query_loader(args.query_path)
        query_embeds, query_ids = encode_queries(
            queries, config, params, tokenizer, args.max_seq_length,
            batch_size=args.per_device_eval_batch_size, mesh=mesh)
        if args.save_query_embed:
            os.makedirs(args.out_query_dir, exist_ok=True)
            from repconc_tpu.core.checkpoint import atomic_np_save
            atomic_np_save(qemb_path, query_embeds)
            atomic_np_save(qids_path, query_ids)

    out_metric_path = os.path.join(args.out_query_dir, "metric.json")
    if os.path.exists(out_metric_path):
        logger.info("Skip search: metric.json already exists")
        return
    os.makedirs(args.out_query_dir, exist_ok=True)

    if mesh is not None:
        from repconc_tpu.parallel.sharded import ShardedFlatIndex

        searcher = ShardedFlatIndex(mesh, corpus_embeds)
        Q = len(query_ids)
        batch = min(args.search_batch, Q)
        all_s, all_i = [], []
        # fixed batch, short final chunk padded: one trace/compile total
        for start in range(0, Q, batch):
            qc = np.asarray(query_embeds[start:start + batch], np.float32)
            real = qc.shape[0]
            if real < batch:
                qc = np.pad(qc, ((0, batch - real), (0, 0)))
            s, i = searcher.search(qc, topk=args.topk)
            all_s.append(s[:real])
            all_i.append(corpus_ids[i[:real]])
        scores = np.concatenate(all_s, 0)
        topk_ids = np.concatenate(all_i, 0)
    else:
        scores, topk_ids = batch_flat_search(
            query_ids, query_embeds, corpus_ids, corpus_embeds,
            topk=args.topk, batch_size=args.search_batch)
    out_run_path = os.path.join(args.out_query_dir, "run.tsv")
    write_run_tsv(out_run_path, query_ids, scores, topk_ids)

    if args.qrel_path is None:
        return
    if args.data_format == "msmarco":
        metrics = evaluate_run(args.qrel_path, out_run_path,
                               relevance_level=args.relevance_level)
    else:
        metrics = evaluate_run(load_beir_qrels(args.qrel_path), out_run_path,
                               relevance_level=args.relevance_level)
    for k, v in metrics.items():
        if k != "perquery":
            logger.info("%s", v)
    with open(out_metric_path, "w") as f:
        json.dump(metrics, f, indent=1)


if __name__ == "__main__":
    main()
