"""Densify the synthetic TRAIN qrels to complete subtopic-level judgments.

Why: the rehearsal's sparse MS MARCO-style judgments (4 judged of ~100
truly-relevant same-subtopic docs) poison hard-negative mining from a
CONVERGED encoder — top-210 retrieval returns mostly unjudged same-subtopic
docs, so "hard negatives" are ~96% false negatives and stage-1/stage-2
training is instructed to rip apart documents the encoder correctly groups
(observed: loss 1.5 -> 31 and codebook RMSE 0.95 -> 53 within 60 steps).
MS MARCO's sparse judgments don't bite the reference this hard because its
corpus has no such duplicate atoms. The synthetic task's full relevance set
is KNOWN (a doc's subtopic is its title's first token), so train judgments
can simply be completed: mining then excludes all same-subtopic docs and the
extracted negatives are genuinely distinguishable (same-topic different-
subtopic and beyond). Dev qrels stay sparse — for EVALUATION, sparse
judgments are consistent across variants and more discriminative (no
ceiling at MRR~1).

Completing the DEV judgments as well (--splits train,dev.small) makes the
metrics measure subtopic-level precision: with sparse judgments, quantized
retrieval must rank 4 judged docs among ~100 textually-near-identical
same-subtopic docs — impossible at 64x compression regardless of training
(measured quantized ceiling MRR ~0.1 vs dense 0.73), so every variant
saturates at the same floor. With complete judgments the top-10 contest is
subtopic-vs-sibling-subtopic discrimination — precisely the axis the
OPQ/JPQ/RepCONC quality ladder controls.

Usage:
  python recipes/synthetic/complete_qrels.py --data_dir <ws>/data \
      [--splits train,dev.small]
rewrites qrels.<split>.tsv in place (original saved as *.sparse.tsv).
"""
import argparse
import os
import re
import shutil
from collections import defaultdict


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--splits", default="train")
    args = parser.parse_args()

    # subtopic words are "sub<digits><variant letter>" (make_synth_data.py:89);
    # the digit run grows past 4 chars for >=10k subtopics, so key on the
    # full numeric id, not a fixed-width prefix
    sub_key = re.compile(r"sub\d+")

    by_sub = defaultdict(list)
    with open(os.path.join(args.data_dir, "corpus.tsv")) as f:
        for line in f:
            docid, title, _ = line.split("\t", 2)
            by_sub[sub_key.match(title.split(" ", 1)[0]).group(0)].append(docid)

    for split in args.splits.split(","):
        qrel_path = os.path.join(args.data_dir, f"qrels.{split}.tsv")
        sparse_path = os.path.join(args.data_dir, f"qrels.{split}.sparse.tsv")
        if not os.path.exists(sparse_path):
            shutil.copy(qrel_path, sparse_path)

        # query text leads with subtopic words (make_synth_data.py: two sub
        # words + one topic word); map each query to its subtopic's doc list
        n_q, n_lines = 0, 0
        with open(os.path.join(args.data_dir, f"queries.{split}.tsv")) as fq, \
                open(qrel_path, "w") as fo:
            for line in fq:
                qid, text = line.rstrip("\n").split("\t", 1)
                sub_word = text.split(" ", 1)[0]
                assert sub_word.startswith("sub"), (qid, text)
                docs = by_sub[sub_key.match(sub_word).group(0)]
                for d in docs:
                    fo.write(f"{qid} 0 {d} 1\n")
                n_q += 1
                n_lines += len(docs)
        print(f"complete {split} qrels: {n_q} queries, {n_lines} judgments "
              f"(sparse original at {sparse_path})")


if __name__ == "__main__":
    main()
