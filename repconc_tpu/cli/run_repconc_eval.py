"""RepCONC index build + retrieval eval. Pipeline stages 8/10
(reference: evaluate/run_repconc_eval.py).

Encodes the corpus to uint8 codes with the DOC encoder, queries to fp32
embeddings with the QUERY encoder, then ADC-searches with the QUERY encoder's
centroids (the stage-2 centroid-swap semantics of replace_pq_centroids,
run_repconc_eval.py:123-127, fall out naturally: search always uses the query
model's codebook against the stored codes).
All artifacts are cached skip-if-exists (run_repconc_eval.py:38-91).
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
from repconc_tpu.index.adc import batch_adc_search

logger = logging.getLogger(__name__)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name_or_path", default=None)
    parser.add_argument("--doc_encoder_path", default=None)
    parser.add_argument("--query_encoder_path", default=None)
    parser.add_argument("--max_seq_length", type=int, default=512)
    parser.add_argument("--corpus_path", required=True)
    parser.add_argument("--query_path", required=True)
    parser.add_argument("--qrel_path", default=None)
    parser.add_argument("--out_corpus_dir", required=True)
    parser.add_argument("--out_query_dir", required=True)
    parser.add_argument("--data_format", default="msmarco",
                        choices=["msmarco", "beir"])
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
    parser.add_argument("--topk", type=int, default=1000)
    parser.add_argument("--search_batch", type=int, default=1200)
    parser.add_argument("--adapter", default=None,
                        help="custom model adapter (e.g. ance, tct)")
    parser.add_argument("--index_type", default="flat", choices=["flat", "ivf"])
    parser.add_argument("--nlist", type=int, default=4096)
    parser.add_argument("--nprobe", type=int, default=64)
    parser.add_argument("--serving", default="auto",
                        choices=["auto", "pallas", "xla", "decoded", "decoded_int8"],
                        help="IVF serving path: auto = the cell-grouped "
                             "Pallas kernel on TPU, XLA scan on CPU; "
                             "decoded = HBM-resident bf16 reconstructions "
                             "scored as fat MXU matmuls (same scores to "
                             "bf16 precision, fastest when HBM has room: "
                             "D*2 bytes/doc vs M bytes/doc); decoded_int8 "
                             "= scale-folded int8 residency (D bytes/doc, "
                             "MXU s8 path — fits 8.8M docs on one chip)")
    parser.add_argument("--lut_dtype", default="bf16",
                        choices=["bf16", "int8"],
                        help="Pallas IVF LUT precision: int8 = per-(query, "
                             "group) quantized LUTs (the TPU analog of "
                             "faiss's fp16-LUT mode one step further; ~1%% "
                             "top-100 churn, halves LUT gather traffic)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="encode over all devices (batch dp-sharded) and "
                             "search with the index sharded over the mesh "
                             "(reference: evaluate_repconc.py:121-153)")
    parser.add_argument("--corpus_embed_path", default=None,
                        help="DEPRECATED, ignored: the IVF coarse quantizer "
                             "is always trained on PQ reconstructions so "
                             "routing stays in the served (post-training) "
                             "space; accepted for recipe compatibility")
    return parser


def resolve_paths(args):
    if args.model_name_or_path is not None:
        assert args.doc_encoder_path is None and args.query_encoder_path is None
        return args.model_name_or_path, args.model_name_or_path
    return args.doc_encoder_path, args.query_encoder_path


def load_model_and_tokenizer(model_dir: str, adapter=None):
    from repconc_tpu.models import repconc_model
    from repconc_tpu.models.adapters import load_adapter_tokenizer

    config, params = repconc_model.from_pretrained(model_dir)
    tokenizer = load_adapter_tokenizer(model_dir, adapter or
                                       config.encoder.model_type)
    return config, params, tokenizer


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()
    doc_dir, query_dir = resolve_paths(args)

    mesh = None
    if args.data_parallel:
        from repconc_tpu.core.mesh import create_mesh

        mesh = create_mesh()
        logger.info("data-parallel eval mesh over %d devices", mesh.size)

    from repconc_tpu.core.profiling import Stopwatch

    sw = Stopwatch()

    # --- corpus codes (cached) ---
    if (os.path.abspath(args.out_corpus_dir)
            == os.path.abspath(args.out_query_dir)):
        # both caches are named codes.npy (reference layout): the same dir
        # would overwrite corpus uint8 codes with fp32 query embeddings and
        # reload them as "pre-computed corpus codes" on the next run
        raise SystemExit("--out_corpus_dir and --out_query_dir must differ")
    codes_path = os.path.join(args.out_corpus_dir, "codes.npy")
    cids_path = os.path.join(args.out_corpus_dir, "corpus_ids.npy")
    if os.path.exists(codes_path) and os.path.exists(cids_path):
        logger.info("Load pre-computed corpus codes")
        codes, corpus_ids = np.load(codes_path), np.load(cids_path)
    else:
        config, params, tokenizer = load_model_and_tokenizer(doc_dir, args.adapter)
        with sw("load_corpus"):
            if args.data_format == "msmarco":
                corpus = load_corpus(args.corpus_path, tokenizer.sep_token)
            else:
                corpus = load_beir_corpus(args.corpus_path)
        shard_cache = os.path.join(args.out_corpus_dir, "encode_shards")
        with sw("encode_corpus"):
            codes, corpus_ids = encode_corpus(
                corpus, config, params, tokenizer, args.max_seq_length,
                batch_size=args.per_device_eval_batch_size, output="code",
                mesh=mesh, stopwatch=sw, cache_dir=shard_cache,
                token_cache_dir=args.token_cache_dir)
        os.makedirs(args.out_corpus_dir, exist_ok=True)
        from repconc_tpu.core.checkpoint import atomic_np_save
        atomic_np_save(codes_path, codes)
        atomic_np_save(cids_path, corpus_ids)
        clear_encode_cache(shard_cache)

    # --- query embeddings (cached) ---
    qemb_path = os.path.join(args.out_query_dir, "codes.npy")  # reference name
    qids_path = os.path.join(args.out_query_dir, "qids.npy")
    q_config, q_params, q_tokenizer = load_model_and_tokenizer(
        query_dir, args.adapter)
    if os.path.exists(qemb_path) and os.path.exists(qids_path):
        logger.info("Load pre-computed query representations")
        query_embeds, query_ids = np.load(qemb_path), np.load(qids_path)
    else:
        if args.data_format == "msmarco":
            queries = load_queries(args.query_path)
        else:
            queries = load_beir_queries(args.query_path)
        with sw("encode_queries"):
            query_embeds, query_ids = encode_queries(
                queries, q_config, q_params, q_tokenizer, args.max_seq_length,
                batch_size=args.per_device_eval_batch_size, mesh=mesh)
        os.makedirs(args.out_query_dir, exist_ok=True)
        from repconc_tpu.core.checkpoint import atomic_np_save
        atomic_np_save(qemb_path, query_embeds)
        atomic_np_save(qids_path, query_ids)

    out_metric_path = os.path.join(args.out_query_dir, "metric.json")
    if os.path.exists(out_metric_path):
        logger.info("Skip search: metric.json already exists")
        return

    # --- search with the QUERY model's centroids (stage-2 swap semantics) ---
    centroids = np.asarray(q_params["centroids"])
    if args.index_type == "ivf":
        from repconc_tpu.index.ivf import (IVFIndex, build_ivf_from_codes,
                                           serve_search)

        ivf_path = os.path.join(args.out_corpus_dir, "ivf_index.npz")
        with sw("build_ivf"):
            ivf = None
            if os.path.exists(ivf_path):
                try:
                    ivf = IVFIndex.load(args.out_corpus_dir)
                except Exception as e:  # partial/corrupt npz from a killed
                    #                     run: rebuild instead of crashing
                    logger.warning("cached ivf_index.npz unreadable (%s) — "
                                   "rebuilding", e)
                    ivf = None
                # staleness guard: a cached index built at a different
                # --nlist, or over different codes (re-encoded corpus),
                # would silently serve wrong results
                if ivf is not None and (
                        ivf.nlist != min(args.nlist, codes.shape[0])
                        or ivf.ntotal != codes.shape[0]):
                    logger.warning(
                        "cached ivf_index.npz is stale (nlist %d vs %d, "
                        "ntotal %d vs %d docs) — rebuilding",
                        ivf.nlist, min(args.nlist, codes.shape[0]),
                        ivf.ntotal, codes.shape[0])
                    ivf = None
            if ivf is None:
                # The coarse quantizer is ALWAYS trained on (and assigns) PQ
                # reconstructions decoded from the codes being served: that
                # is the only space guaranteed consistent with both the ADC
                # scores and the query embeddings. Building it from a saved
                # dense corpus_embeds.npy instead is stale whenever the doc
                # encoder was trained after those embeds were written
                # (stage-1 moves the doc encoder): queries then probe coarse
                # centroids living in the pre-training space, which
                # systematically penalizes exactly the trained variants
                # (measured: -2 to -4 MRR@10 on the 200k synthetic matrix).
                if args.corpus_embed_path:
                    logger.info("--corpus_embed_path is ignored for the IVF "
                                "coarse build: training on PQ "
                                "reconstructions keeps routing consistent "
                                "with the served (post-training) space")
                ivf = build_ivf_from_codes(codes, centroids, nlist=args.nlist)
                ivf.save(args.out_corpus_dir)
        ivf.set_centroids(centroids)
        with sw("search"):
            decoded = args.serving in ("decoded", "decoded_int8")
            scores, row_ids = serve_search(
                ivf, query_embeds, topk=args.topk, nprobe=args.nprobe,
                search_batch=args.search_batch,
                mode=("pallas" if decoded else args.serving), mesh=mesh,
                lut_dtype=args.lut_dtype,
                serving=(args.serving if decoded else "adc"))
        # -1 pad rows (score=-inf) must not wrap through corpus_ids; clamp —
        # write_run_tsv drops the non-finite entries.
        topk_ids = corpus_ids[np.maximum(row_ids, 0)]
    elif mesh is not None:
        from repconc_tpu.parallel.sharded import sharded_batch_adc_search

        with sw("search"):
            scores, row_ids = sharded_batch_adc_search(
                mesh, query_embeds, codes, centroids,
                topk=args.topk, batch_size=args.search_batch)
        topk_ids = corpus_ids[np.maximum(row_ids, 0)]
    else:
        with sw("search"):
            scores, topk_ids = batch_adc_search(
                query_ids, query_embeds, corpus_ids, codes, centroids,
                topk=args.topk, batch_size=args.search_batch)
    out_run_path = os.path.join(args.out_query_dir, "run.tsv")
    write_run_tsv(out_run_path, query_ids, scores, topk_ids)
    logger.info("phase wall-clock (s): %s",
                {k: round(v, 2) for k, v in sw.totals.items()})
    with open(os.path.join(args.out_query_dir, "timings.json"), "w") as f:
        json.dump({k: round(v, 3) for k, v in sw.totals.items()}, f, indent=1)

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
