"""Carve a small validation split out of the full collection.

Pipeline stage 4. Behavior parity with the reference's
train/run_gen_valid_set.py: the validation corpus is the union of (a)
every judged document in the dev qrels (any relevance grade) and (b) the
top-`--topk` documents a dense run retrieved for each judged query —
small enough to re-encode every eval_steps during stage-1 training while
still containing each query's positives and its hardest distractors.
Queries and qrels pass through unchanged.

Bootstrap mode (stage 0, before any run exists): omit --input_run_path and
pass --random_sample N to pad the judged docids with N randomly sampled
corpus docs instead of run-mined distractors — used by the dense
pre-training stage, whose validation must exist before the first dense run.
"""
from __future__ import annotations

import argparse
import logging
import os
import shutil

from repconc_tpu.core.logging_utils import setup_logging
from repconc_tpu.eval.run_io import iter_run

logger = logging.getLogger(__name__)


def select_validation_docids(qrel_path: str, run_path: str, depth: int) -> set:
    """Judged docids (all grades) + top-`depth` run docids of judged queries."""
    judged_queries: set = set()
    keep: set = set()
    with open(qrel_path) as fh:
        for line in fh:
            qid, _, docid, _rel = line.split()
            judged_queries.add(qid)
            keep.add(docid)
    for qid, docid, rank in iter_run(run_path):
        if rank <= depth and qid in judged_queries:
            keep.add(docid)
    return keep


def sample_corpus_docids(qrel_path: str, corpus_path: str, n_sample: int,
                         seed: int = 0) -> set:
    """Judged docids + `n_sample` random corpus docids (run-free bootstrap)."""
    import random

    keep: set = set()
    with open(qrel_path) as fh:
        for line in fh:
            _qid, _, docid, _rel = line.split()
            keep.add(docid)
    all_ids = []
    with open(corpus_path) as fh:
        for line in fh:
            all_ids.append(line.split("\t", 1)[0])
    rng = random.Random(seed)
    # sample from the UNJUDGED pool: drawing from all_ids lets judged ids
    # (and duplicate-id lines) absorb draws, silently shrinking the corpus
    # below the requested judged + n_sample size
    pool = sorted(set(all_ids) - keep)
    keep.update(rng.sample(pool, min(n_sample, len(pool))))
    return keep


def filter_corpus_tsv(src_path: str, dst_path: str, keep: set) -> int:
    """Copy the corpus TSV lines whose id column is in `keep`; return count."""
    kept = 0
    with open(src_path) as fin, open(dst_path, "w") as fout:
        for line in fin:
            if line.split("\t", 1)[0] in keep:
                fout.write(line)
                kept += 1
    return kept


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_corpus_path", required=True)
    parser.add_argument("--input_query_path", required=True)
    parser.add_argument("--input_qrel_path", required=True)
    parser.add_argument("--input_run_path", default=None,
                        help="dense run to mine distractors from; omit with "
                             "--random_sample for the stage-0 bootstrap mode")
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--random_sample", type=int, default=0,
                        help="run-free mode: pad judged docids with N random docs")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_corpus_path", required=True)
    parser.add_argument("--output_query_path", required=True)
    parser.add_argument("--output_qrel_path", required=True)
    args = parser.parse_args(argv)
    setup_logging()

    if not args.input_run_path and args.random_sample <= 0:
        # validate the mode BEFORE writing: failing after the query/qrel
        # copies leaves a partial output a resumed recipe could mistake
        # for a completed stage
        parser.error("need --input_run_path or --random_sample > 0")

    for path in (args.output_corpus_path, args.output_query_path,
                 args.output_qrel_path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.copy(args.input_query_path, args.output_query_path)
    shutil.copy(args.input_qrel_path, args.output_qrel_path)

    if args.input_run_path:
        keep = select_validation_docids(args.input_qrel_path,
                                        args.input_run_path, args.topk)
    elif args.random_sample > 0:
        keep = sample_corpus_docids(args.input_qrel_path,
                                    args.input_corpus_path,
                                    args.random_sample, seed=args.seed)
    kept = filter_corpus_tsv(args.input_corpus_path, args.output_corpus_path,
                             keep)
    logger.info("validation corpus: wrote %d of %d selected docids to %s",
                kept, len(keep), args.output_corpus_path)


if __name__ == "__main__":
    main()
