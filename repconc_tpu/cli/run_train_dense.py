"""Stage-0 dense contrastive pre-training CLI.

The reference ASSUMES a converged dense encoder as the pipeline's input —
every example family starts from a published dense checkpoint
(examples/sentence-bert/README.md:11-17: RepCONC > JPQ > OPQ is measured
*from converged dense encoders*; run_train_conc.py:100-104 loads the warmup
of a converged model). In this zero-egress environment no such checkpoint is
reachable, so this CLI produces one: contrastive training of the dense
encoder (no quantization in the graph — Stage1Hparams.quantize=False reuses
the whole stage-1 machinery: gradient-cache chunking, global-batch loss,
false-negative/duplicate masks, GSPMD data parallelism) with in-batch +
sampled negatives, validated by exact flat-IP retrieval, exported as a
standard HF checkpoint (models/auto.py:export_hf_weights) that pipeline
stage 2 consumes unchanged.

Usage:
  python -m repconc_tpu.cli.run_train_dense \
      --model_name_or_path <hf_dir> --output_dir <out> \
      --qrel_path ... --query_path ... --corpus_path ... \
      --valid_qrel_path ... --valid_query_path ... --valid_corpus_path ... \
      --pooling mean --similarity_metric METRIC_IP \
      --per_device_train_batch_size 256 --max_steps 2000
The trained HF checkpoint lands in <output_dir>/export_hf.
"""
from __future__ import annotations

import argparse
import logging
import os

from repconc_tpu.core.logging_utils import setup_logging

logger = logging.getLogger(__name__)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name_or_path", required=True,
                        help="HF dense encoder dir (e.g. random-init bert)")
    parser.add_argument("--adapter", default=None)
    parser.add_argument("--pooling", default="mean", choices=["cls", "mean"])
    parser.add_argument("--similarity_metric", default="METRIC_IP",
                        choices=["METRIC_IP", "METRIC_COS"])
    # data
    parser.add_argument("--qrel_path", required=True)
    parser.add_argument("--query_path", required=True)
    parser.add_argument("--corpus_path", required=True)
    parser.add_argument("--valid_qrel_path", default=None)
    parser.add_argument("--valid_query_path", default=None)
    parser.add_argument("--valid_corpus_path", default=None)
    parser.add_argument("--max_query_len", type=int, default=16)
    parser.add_argument("--max_doc_len", type=int, default=128)
    parser.add_argument("--negative", default="random",
                        help="inbatch | random | path to hard-neg json")
    parser.add_argument("--negative_per_query", type=int, default=1)
    parser.add_argument("--max_positives", type=int, default=8,
                        help="padded per-query positives list driving the "
                             "in-batch false-negative mask; set to the "
                             "dataset's max qrels length for exact mask "
                             "semantics under densely-judged qrels")
    # training
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--per_device_train_batch_size", type=int, default=256)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--warmup_steps", type=int, default=100)
    parser.add_argument("--max_steps", type=int, default=2000)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--cache_chunk_size", type=int, default=-1)
    parser.add_argument("--logging_steps", type=int, default=20)
    parser.add_argument("--eval_steps", type=int, default=0)
    parser.add_argument("--save_steps", type=int, default=0)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--data_parallel", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()

    from repconc_tpu.eval import load_corpus, load_queries, parse_qrels
    from repconc_tpu.models import repconc_model
    from repconc_tpu.models.adapters import load_adapter_tokenizer
    from repconc_tpu.models.auto import save_hf_checkpoint
    from repconc_tpu.train import stage1
    from repconc_tpu.train.data import (FinetuneCollator, QDRelDataset,
                                        batch_iterator)

    # Wrap the HF encoder in a RepConcConfig purely to reuse the stage-1
    # machinery; M is irrelevant when quantize=False (pick any divisor).
    config, params = repconc_model.from_dense_encoder(
        args.model_name_or_path, MCQ_M=1,
        similarity_metric=args.similarity_metric, pooling=args.pooling,
        adapter=args.adapter)
    tokenizer = load_adapter_tokenizer(
        args.model_name_or_path, args.adapter or config.encoder.model_type)

    if args.negative == "inbatch" and args.negative_per_query != 0:
        # inbatch mode carries no explicit negatives (the dataset asserts
        # negative_per_query == 0); reconcile instead of crashing
        logger.info("--negative inbatch: forcing --negative_per_query 0 "
                    "(was %d)", args.negative_per_query)
        args.negative_per_query = 0
    dataset = QDRelDataset(
        args.qrel_path, args.query_path, args.corpus_path,
        negative=args.negative, negative_per_query=args.negative_per_query,
        sep_token=tokenizer.sep_token or "[SEP]",
        max_positives=args.max_positives)
    collator = FinetuneCollator(tokenizer, args.max_query_len, args.max_doc_len,
                                max_positives=args.max_positives)

    hp = stage1.Stage1Hparams(
        learning_rate=args.learning_rate,
        centroid_learning_rate=0.0,
        weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        total_steps=args.max_steps,
        temperature=args.temperature,
        negative_per_query=args.negative_per_query,
        quantize=False,
        cache_chunk_size=args.cache_chunk_size,
        seed=args.seed,
        logging_steps=args.logging_steps,
        eval_steps=args.eval_steps,
        save_steps=args.save_steps,
    )

    valid_set = None
    if args.valid_qrel_path:
        valid_set = (
            load_corpus(args.valid_corpus_path, tokenizer.sep_token or "[SEP]"),
            load_queries(args.valid_query_path),
            parse_qrels(args.valid_qrel_path),
        )

    mesh = None
    if args.data_parallel:
        from repconc_tpu.core.mesh import create_mesh

        mesh = create_mesh()
        logger.info("data-parallel mesh over %d devices", mesh.size)
        if args.per_device_train_batch_size % mesh.size != 0:
            raise SystemExit(
                f"--per_device_train_batch_size is the GLOBAL batch under "
                f"--data_parallel and must divide by the mesh size "
                f"({mesh.size}); got {args.per_device_train_batch_size}")

    batches = batch_iterator(dataset, collator, args.per_device_train_batch_size,
                             seed=args.seed)
    out = stage1.train(config, params, batches, hp, args.output_dir,
                       tokenizer=tokenizer, valid_set=valid_set, mesh=mesh)
    logger.info("finished at step %d (best %.5f)", out["step"], out["best_metric"])

    # Export the winning checkpoint (best by valid MRR@10 if evaluated,
    # else final) as an HF dir for pipeline stage 2.
    src = os.path.join(args.output_dir, "best")
    if not os.path.isdir(src):
        src = os.path.join(args.output_dir, "final")
    cfg, best_params = repconc_model.from_pretrained(src)
    export_dir = os.path.join(args.output_dir, "export_hf")
    save_hf_checkpoint(export_dir, args.model_name_or_path,
                       best_params["encoder"], cfg.encoder,
                       similarity_metric=cfg.similarity_metric)
    logger.info("exported HF checkpoint to %s", export_dir)


if __name__ == "__main__":
    main()
