"""Extract hard negatives from a TREC run: top-k per query minus qrel
positives -> {qid: [docid...]} JSON. Pipeline stage 6
(reference: train/run_extract_hardneg.py).
"""
from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

from repconc_tpu.core.logging_utils import setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_path", required=True)
    parser.add_argument("--qrel_path", required=True)
    parser.add_argument("--topk", type=int, required=True)
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args(argv)
    setup_logging()

    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)), exist_ok=True)
    qrel = defaultdict(set)
    with open(args.qrel_path) as f:
        for line in f:
            query_id, _, object_id, relevance = line.strip().split()
            if int(relevance) > 0:
                qrel[query_id].add(object_id)

    hardneg = defaultdict(list)
    with open(args.run_path) as f:
        for line in f:
            query_id, _, object_id, ranking, _, _ = line.strip().split()
            if int(ranking) <= args.topk and object_id not in qrel[query_id]:
                hardneg[query_id].append(object_id)

    with open(args.output_path, "w") as f:
        json.dump(hardneg, f)


if __name__ == "__main__":
    main()
