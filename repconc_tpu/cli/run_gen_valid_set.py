"""Sample a small validation corpus: qrel docs U top-k run docs per dev query.
Pipeline stage 4 (reference: train/run_gen_valid_set.py).
"""
from __future__ import annotations

import argparse
import os
import shutil

from repconc_tpu.core.logging_utils import setup_logging


def sample_docs_from_topics(qrel_path: str, run_path: str, topk: int):
    all_qids, sampled_pids = set(), set()
    with open(qrel_path) as f:
        for line in f:
            qid, _, pid, _ = line.split()
            all_qids.add(qid)
            sampled_pids.add(pid)
    with open(run_path) as f:
        for line in f:
            qid, _, pid, rank, _, _ = line.split()
            if int(rank) <= topk and qid in all_qids:
                sampled_pids.add(pid)
    return sampled_pids


def output_corpus(in_corpus_path: str, out_corpus_path: str, sampled):
    cnt = 0
    with open(out_corpus_path, "w") as out, open(in_corpus_path) as f:
        for line in f:
            pid = line.split("\t", maxsplit=1)[0]
            if pid in sampled:
                out.write(line)
                cnt += 1
    print(f"Write Cnt: {cnt}, Sample Cnt: {len(sampled)}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_corpus_path", required=True)
    parser.add_argument("--input_query_path", required=True)
    parser.add_argument("--input_qrel_path", required=True)
    parser.add_argument("--input_run_path", required=True)
    parser.add_argument("--topk", type=int, required=True)
    parser.add_argument("--output_corpus_path", required=True)
    parser.add_argument("--output_query_path", required=True)
    parser.add_argument("--output_qrel_path", required=True)
    args = parser.parse_args(argv)
    setup_logging()

    for p in (args.output_corpus_path, args.output_query_path,
              args.output_qrel_path):
        os.makedirs(os.path.dirname(os.path.abspath(p)), exist_ok=True)
    shutil.copy(args.input_qrel_path, args.output_qrel_path)
    shutil.copy(args.input_query_path, args.output_query_path)
    docids = sample_docs_from_topics(args.output_qrel_path,
                                     args.input_run_path, args.topk)
    output_corpus(args.input_corpus_path, args.output_corpus_path, docids)


if __name__ == "__main__":
    main()
