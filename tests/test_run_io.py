"""MS MARCO / BEIR data loading tests."""
import json

import numpy as np

from repconc_tpu.eval.run_io import (
    concat_title_body, load_beir_corpus, load_beir_qrels, load_beir_queries,
    load_corpus, load_qrels, load_queries, write_run_tsv,
)


def test_load_corpus_sep_join_and_truncation(tmp_path):
    p = tmp_path / "corpus.tsv"
    p.write_text("d1\ttitle one\tbody text\nd2\t" + "x" * 20000 + "\n")
    corpus = load_corpus(str(p), sep_token="[SEP]")
    assert corpus["d1"] == "title one[SEP]body text"
    assert len(corpus["d2"]) == 10_000  # 10k-char truncation


def test_load_queries(tmp_path):
    p = tmp_path / "q.tsv"
    p.write_text("q1\twhat is x\nq2\thow to y\n")
    q = load_queries(str(p))
    assert q == {"q1": "what is x", "q2": "how to y"}


def test_concat_title_body():
    assert concat_title_body({"title": "A title", "text": "body"}) == "A title. body"
    assert concat_title_body({"title": "Done!", "text": "body"}) == "Done! body"
    assert concat_title_body({"text": "body"}) == "body"
    assert concat_title_body({"title": "  ", "text": "body"}) == "body"


def test_beir_loaders(tmp_path):
    corpus_path = tmp_path / "corpus.jsonl"
    with open(corpus_path, "w") as f:
        f.write(json.dumps({"_id": "c1", "title": "T", "text": "body"}) + "\n")
        f.write(json.dumps({"_id": "c2", "title": "", "text": "only body"}) + "\n")
    corpus = load_beir_corpus(str(corpus_path))
    assert corpus == {"c1": "T. body", "c2": "only body"}

    q_path = tmp_path / "queries.jsonl"
    with open(q_path, "w") as f:
        f.write(json.dumps({"_id": "q1", "text": " a query "}) + "\n")
    assert load_beir_queries(str(q_path)) == {"q1": "a query"}

    qrel_path = tmp_path / "qrels.tsv"
    qrel_path.write_text("query-id\tcorpus-id\tscore\nq1\tc1\t2\nq1\tc2\t0\n")
    qrels = load_beir_qrels(str(qrel_path))
    assert qrels == {"q1": {"c1": 2, "c2": 0}}


def test_load_qrels_threshold(tmp_path):
    p = tmp_path / "qrels.txt"
    p.write_text("q1 0 d1 1\nq1 0 d2 0\nq2 0 d3 2\n")
    assert load_qrels(str(p)) == {"q1": ["d1"], "q2": ["d3"]}
    assert load_qrels(str(p), rel_threshold=2) == {"q2": ["d3"]}


def test_write_run_roundtrip(tmp_path):
    from repconc_tpu.eval.trec import parse_run

    p = tmp_path / "run.tsv"
    write_run_tsv(str(p), ["q1"], np.array([[2.5, 1.0]]),
                  np.array([["dA", "dB"]]))
    run = parse_run(str(p))
    assert run == {"q1": {"dA": 2.5, "dB": 1.0}}


def test_write_run_drops_pad_sentinels(tmp_path):
    """IVF pads short candidate sets with score=-inf / id=-1; those rows
    must not be written (the -1 would have wrapped through corpus_ids)."""
    from repconc_tpu.eval.trec import parse_run

    p = tmp_path / "run.tsv"
    write_run_tsv(str(p), ["q1", "q2"],
                  np.array([[2.5, -np.inf], [-np.inf, -np.inf]]),
                  np.array([["dA", "dX"], ["dY", "dZ"]]))
    run = parse_run(str(p))
    assert run == {"q1": {"dA": 2.5}}
    # ranks stay contiguous after filtering
    lines = p.read_text().splitlines()
    assert len(lines) == 1 and lines[0].split("\t")[3] == "1"


def test_run_from_topk_drops_pad_sentinels():
    from repconc_tpu.eval.pipeline import run_from_topk

    run = run_from_topk(["q1"], np.array([[1.5, -np.inf]]),
                        np.array([[7, -1]]))
    assert run == {"q1": {"7": 1.5}}


def test_iter_run(tmp_path):
    from repconc_tpu.eval.run_io import iter_run

    p = tmp_path / "run.tsv"
    p.write_text("q1\tQ0\tdA\t1\t3.5\tsys\nq1\tQ0\tdB\t2\t2.0\tsys\n")
    assert list(iter_run(str(p))) == [("q1", "dA", 1), ("q1", "dB", 2)]
