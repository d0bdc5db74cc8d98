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

Usage:
  python recipes/synthetic/complete_qrels.py --data_dir <ws>/data
rewrites qrels.train.tsv in place (original saved as qrels.train.sparse.tsv).
"""
import argparse
import os
import shutil
from collections import defaultdict


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    args = parser.parse_args()

    by_sub = defaultdict(list)
    with open(os.path.join(args.data_dir, "corpus.tsv")) as f:
        for line in f:
            docid, title, _ = line.split("\t", 2)
            by_sub[title.split(" ", 1)[0][:7]].append(docid)  # "subNNNN"

    qrel_path = os.path.join(args.data_dir, "qrels.train.tsv")
    sparse_path = os.path.join(args.data_dir, "qrels.train.sparse.tsv")
    if not os.path.exists(sparse_path):
        shutil.copy(qrel_path, sparse_path)

    # query text leads with subtopic words (make_synth_data.py: two sub words
    # + one topic word); map each train query to its subtopic's full doc list
    n_q, n_lines = 0, 0
    with open(os.path.join(args.data_dir, "queries.train.tsv")) as fq, \
            open(qrel_path, "w") as fo:
        for line in fq:
            qid, text = line.rstrip("\n").split("\t", 1)
            sub_word = text.split(" ", 1)[0]
            assert sub_word.startswith("sub"), (qid, text)
            docs = by_sub[sub_word[:7]]  # variant letters a/b/c share the id
            for d in docs:
                fo.write(f"{qid} 0 {d} 1\n")
            n_q += 1
            n_lines += len(docs)
    print(f"complete train qrels: {n_q} queries, {n_lines} judgments "
          f"(sparse original at {sparse_path})")


if __name__ == "__main__":
    main()
