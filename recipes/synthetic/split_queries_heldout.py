"""Subtopic-disjoint query split for the held-out stage-0 experiment.

Round-3 finding (RESULTS.md): on the saturated synthetic task the dense
encoder is already task-optimal (MRR@10 0.967), so stage-1 doc-side
training has no headroom and the reference's RepCONC > JPQ > OPQ MRR@10
ordering (examples/sentence-bert/README.md:11-17) cannot appear. On MS
MARCO the starting encoders are far from saturated. This splitter creates
that situation synthetically: stage 0 converges on queries from HALF the
subtopics; stages 2-10 train and evaluate on the OTHER half, so the doc
encoder is genuinely non-optimal for the task and doc-side adaptation has
measurable headroom.

A query's first token is one of its subtopic's three signature words
(make_synth_data.py), so hashing the first token splits by subtopic
without touching generator internals. Qrels follow their queries; the
corpus is shared (symlink).

Usage: python split_queries_heldout.py <src_data_dir> <out_root>
Produces <out_root>/data_stage0 (hash-even subtopics) and
<out_root>/data_task (hash-odd), each a complete DATA_DIR layout.
"""
import hashlib
import os
import re
import sys

_SUB = re.compile(r"^sub(\d+)[a-z]$")


def _side(query_text: str) -> int:
    first = query_text.split()[0]
    # make_synth_data subtopic words are subNNNN{a,b,c}: hash the SUBTOPIC
    # id, not the surface variant, or one subtopic's queries would land on
    # both sides and the split would not be subtopic-disjoint
    m = _SUB.match(first)
    key = m.group(1) if m else first
    return hashlib.sha1(key.encode()).digest()[0] % 2


def split(src: str, out_root: str) -> None:
    dirs = [os.path.join(out_root, "data_stage0"),
            os.path.join(out_root, "data_task")]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "corpus.tsv")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(os.path.join(src, "corpus.tsv")), link)

    for split_name in ("train", "dev.small"):
        sides = {}
        outs = [open(os.path.join(d, f"queries.{split_name}.tsv"), "w")
                for d in dirs]
        with open(os.path.join(src, f"queries.{split_name}.tsv")) as f:
            for line in f:
                qid, text = line.rstrip("\n").split("\t")
                s = _side(text)
                sides[qid] = s
                outs[s].write(line)
        for o in outs:
            o.close()
        routs = [open(os.path.join(d, f"qrels.{split_name}.tsv"), "w")
                 for d in dirs]
        with open(os.path.join(src, f"qrels.{split_name}.tsv")) as f:
            for line in f:
                qid = line.split()[0]
                if qid in sides:
                    routs[sides[qid]].write(line)
        for o in routs:
            o.close()
        n0 = sum(1 for _ in open(
            os.path.join(dirs[0], f"queries.{split_name}.tsv")))
        n1 = sum(1 for _ in open(
            os.path.join(dirs[1], f"queries.{split_name}.tsv")))
        print(f"{split_name}: stage0={n0} task={n1}")
        assert n0 and n1, "degenerate split — check the first-token hashing"


if __name__ == "__main__":
    split(sys.argv[1], sys.argv[2])
