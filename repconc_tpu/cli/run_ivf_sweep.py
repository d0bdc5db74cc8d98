"""IVF nprobe sweep: recall-vs-throughput curve for a built code index.

Reproduces the reference's QPS-vs-effectiveness analysis
(figures/psg_vs_cplx_qps.png, README.md:23-25 — published as a figure only,
no tooling). Given corpus embeddings + codes + queries, builds the IVF
index, then for each nprobe measures search QPS and recall@k against the
exact flat-ADC ranking.

Usage:
  python -m repconc_tpu.cli.run_ivf_sweep \
      --codes_path codes.npy --corpus_embed_path corpus_embeds.npy \
      --query_embed_path query_embeds.npy --model_name_or_path <model_dir> \
      --nlist 4096 --nprobes 8,16,32,64,128 --topk 100 --out sweep.json
"""
from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

from repconc_tpu.core.logging_utils import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--codes_path", required=True)
    parser.add_argument("--corpus_embed_path", default=None,
                        help="ROTATED corpus embeddings aligned with codes, "
                             "from the SAME encoder that produced them (a "
                             "stale pre-training matrix skews coarse "
                             "routing against trained models); omit to "
                             "train the coarse quantizer on PQ "
                             "reconstructions, as run_repconc_eval does")
    parser.add_argument("--query_embed_path", required=True)
    parser.add_argument("--model_name_or_path", required=True,
                        help="RepCONC model dir (for centroids)")
    parser.add_argument("--nlist", type=int, default=4096)
    parser.add_argument("--nprobes", default="8,16,32,64,128")
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--balanced", action="store_true")
    parser.add_argument("--use_pallas", action="store_true",
                        help="serve with the TPU cell-grouped kernel")
    parser.add_argument("--lut_dtype", default="bf16",
                        choices=["bf16", "int8"],
                        help="with --use_pallas: serve with quantized int8 "
                             "LUTs — the sweep then measures the REAL-index "
                             "recall churn of the int8 mode, not just its "
                             "random-data churn")
    parser.add_argument("--serving", default="adc",
                        choices=["adc", "decoded", "decoded_int8"],
                        help="with --use_pallas: decoded-residency serving "
                             "(the sweep then measures decoded-vs-exact "
                             "recall on a REAL index)")
    parser.add_argument("--out", default="sweep.json")
    args = parser.parse_args(argv)
    setup_logging()

    from repconc_tpu.index.adc import adc_search
    from repconc_tpu.index.ivf import (build_ivf, build_ivf_from_codes,
                                       search_xla)
    from repconc_tpu.models import repconc_model

    codes = np.load(args.codes_path)
    queries = np.load(args.query_embed_path)
    _, params = repconc_model.from_pretrained(args.model_name_or_path)
    centroids = np.asarray(params["centroids"])

    logger.info("exact baseline (flat ADC) ...")
    _, exact_ids = adc_search(queries, codes, centroids, topk=args.topk)

    if args.corpus_embed_path:
        index = build_ivf(np.load(args.corpus_embed_path), codes, centroids,
                          nlist=args.nlist, balanced=args.balanced)
    else:
        index = build_ivf_from_codes(codes, centroids, nlist=args.nlist,
                                     balanced=args.balanced)
    searcher = None
    if args.use_pallas:
        from repconc_tpu.index.pallas_ivf import PallasIVFIndex

        searcher = PallasIVFIndex(index)

    results = []
    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        def run():
            if searcher is not None:
                return searcher.search(queries, topk=args.topk, nprobe=nprobe,
                                       lut_dtype=args.lut_dtype,
                                       serving=args.serving)
            return search_xla(index, queries, topk=args.topk, nprobe=nprobe)

        run()  # warm the jit caches
        t0 = time.perf_counter()
        _, ids = run()
        dt = time.perf_counter() - t0
        recall = float(np.mean([
            len(set(ids[q]) & exact_q) / max(1, len(exact_q))
            for q in range(len(queries))
            # -1 = padding in short candidate sets; the denominator is the
            # number of REAL exact results (N may be < topk)
            for exact_q in [set(exact_ids[q]) - {-1}]]))
        row = {"nprobe": nprobe, "qps": round(len(queries) / dt, 2),
               "recall_vs_exact@%d" % args.topk: round(recall, 4)}
        logger.info("%s", row)
        results.append(row)

    with open(args.out, "w") as f:
        json.dump({"nlist": args.nlist, "topk": args.topk,
                   "serving": ((args.serving if args.serving != "adc"
                                else "pallas") if args.use_pallas else "xla"),
                   "lut_dtype": args.lut_dtype if args.use_pallas else "fp32",
                   "results": results}, f, indent=1)
    logger.info("sweep -> %s", args.out)


if __name__ == "__main__":
    main()
