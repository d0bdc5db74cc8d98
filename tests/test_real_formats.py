"""Real-download format fixtures: prepare_msmarco.sh offline + loaders + CLI.

The reference's loaders were shaped by real MS MARCO quirks
(eval_utils.py:46-95: multi-field TSVs, BEIR header rows, TREC-DL graded
space-separated qrels vs MS MARCO binary tab-separated qrels). This
environment has zero egress, so `tests/fixtures/` carries tiny files
byte-exact to the real layouts; these tests pack them into the archives the
mirrors serve, run `recipes/prepare_msmarco.sh` fully offline on them, and
drive the loaders and the dense-eval CLI end-to-end from the result.
"""
import gzip
import json
import os
import shutil
import subprocess
import tarfile

import numpy as np
import pytest

from repconc_tpu.eval.run_io import (
    load_beir_corpus, load_beir_qrels, load_beir_queries, load_corpus,
    load_qrels, load_queries, MAX_DOC_CHARS,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
MSMARCO = os.path.join(FIXTURES, "msmarco")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARCHIVE_MEMBERS = [
    "collection.tsv", "queries.train.tsv", "queries.dev.tsv",
    "queries.dev.small.tsv", "qrels.train.tsv", "qrels.dev.small.tsv",
]


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    """Pack the fixtures into the real download artifacts, then run
    prepare_msmarco.sh with NO network (every fetch is pre-satisfied)."""
    root = tmp_path_factory.mktemp("msmarco_dl")
    with tarfile.open(root / "collectionandqueries.tar.gz", "w:gz") as tar:
        for name in ARCHIVE_MEMBERS:
            tar.add(os.path.join(MSMARCO, name), arcname=name)
    for year in ("2019", "2020"):
        shutil.copy(os.path.join(MSMARCO, f"{year}qrels-pass.txt"), root)
        src = os.path.join(MSMARCO, f"msmarco-test{year}-queries.tsv")
        with open(src, "rb") as fin, gzip.open(
                root / f"msmarco-test{year}-queries.tsv.gz", "wb") as fout:
            shutil.copyfileobj(fin, fout)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "recipes", "prepare_msmarco.sh"),
         str(root)], capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    return root


def test_prepare_script_offline_products(prepared_dir):
    for name in ("corpus.tsv", "queries.train.tsv", "queries.dev.small.tsv",
                 "qrels.train.tsv", "qrels.dev.small.tsv",
                 "2019qrels-pass.txt", "msmarco-test2019-queries.tsv",
                 "2020qrels-pass.txt", "msmarco-test2020-queries.tsv"):
        assert (prepared_dir / name).exists(), name
    assert not (prepared_dir / "collection.tsv").exists()  # renamed
    # idempotent re-run (resume after partial download)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "recipes", "prepare_msmarco.sh"),
         str(prepared_dir)], capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr


def test_passage_collection_loader(prepared_dir):
    corpus = load_corpus(str(prepared_dir / "corpus.tsv"), "[SEP]")
    assert len(corpus) == 6
    assert corpus["0"].startswith("The presence of communication")
    assert len(corpus["4"]) == MAX_DOC_CHARS          # 10k-char truncation
    assert "São Paulo" in corpus["5"]                 # unicode survives
    assert "[SEP]" not in corpus["1"]                 # single-field: no join


def test_doc_corpus_multifield_sep_join():
    corpus = load_corpus(os.path.join(MSMARCO, "msmarco_docs.sample.tsv"),
                         "[SEP]")
    doc = corpus["D1555982"]
    # docid \t url \t title \t body -> url[SEP]title[SEP]body
    assert doc.count("[SEP]") == 2
    url, title, body = doc.split("[SEP]")
    assert url.startswith("https://")
    assert title == "The hot glowing surfaces of stars emit energy"
    assert body.startswith("Science & Mathematics")


def test_query_and_qrel_loaders(prepared_dir):
    queries = load_queries(str(prepared_dir / "queries.dev.small.tsv"))
    assert queries["1048585"] == "what is paula deen's brother"
    # MS MARCO qrels: TAB-separated binary
    qrels = load_qrels(str(prepared_dir / "qrels.dev.small.tsv"))
    assert qrels == {"1048585": ["1"], "1048565": ["5"]}


def test_trecdl_graded_qrels(prepared_dir):
    # TREC-DL qrels: SPACE-separated graded 0..3; threshold 2 is the
    # standard binarization (reference eval_utils.py relevance_level)
    qrels = load_qrels(str(prepared_dir / "2019qrels-pass.txt"),
                       rel_threshold=2)
    assert qrels == {"19335": ["2"], "1110199": ["5"]}
    lenient = load_qrels(str(prepared_dir / "2019qrels-pass.txt"),
                         rel_threshold=1)
    assert sorted(lenient["19335"]) == ["0", "2"]  # rel=0 rows excluded
    from repconc_tpu.eval.trec import parse_qrels
    graded = parse_qrels(str(prepared_dir / "2019qrels-pass.txt"))
    assert graded["19335"]["2"] == 3 and graded["19335"]["3"] == 0


def test_beir_loaders():
    beir = os.path.join(FIXTURES, "beir", "scifact")
    corpus = load_beir_corpus(os.path.join(beir, "corpus.jsonl"))
    assert corpus["4983"].startswith(
        "Microstructural development of human newborn cerebral white "
        "matter. Alterations")                        # ". " join
    assert corpus["18670"].startswith("A body-only")  # empty title: body only
    assert corpus["4066"].startswith(
        "Does apoptosis play a role? Title already")  # no extra period
    queries = load_beir_queries(os.path.join(beir, "queries.jsonl"))
    assert queries["1"].startswith("0-dimensional biomaterials")
    qrels = load_beir_qrels(os.path.join(beir, "qrels", "test.tsv"))
    assert qrels == {"1": {"4983": 1}, "3": {"18670": 1, "4066": 1}}


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(31)
    model_dir = tmp_path_factory.mktemp("tiny_model")
    words = ("what is paula deen's brother el nino weather the presence of "
             "communication scientific environment cost painting").split()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(set(words))
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(model_dir / "vocab.txt"))
    tok.save_pretrained(model_dir)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=64, max_position_embeddings=64,
                     pad_token_id=0)
    BertModel(cfg, add_pooling_layer=False).save_pretrained(model_dir)
    return model_dir


def test_dense_eval_cli_from_prepared_msmarco(prepared_dir, tiny_model,
                                              tmp_path):
    """The standard eval CLI runs unmodified from the prepared directory —
    the exact flow a user performs after the real download."""
    from repconc_tpu.cli import run_dense_eval

    run_dense_eval.main([
        "--model_name_or_path", str(tiny_model),
        "--corpus_path", str(prepared_dir / "corpus.tsv"),
        "--query_path", str(prepared_dir / "queries.dev.small.tsv"),
        "--qrel_path", str(prepared_dir / "qrels.dev.small.tsv"),
        "--out_corpus_dir", str(tmp_path / "corpus_out"),
        "--out_query_dir", str(tmp_path / "dev_out"),
        "--pooling", "mean", "--similarity_metric", "METRIC_IP",
        "--max_seq_length", "32", "--topk", "5"])
    metric = json.load(open(tmp_path / "dev_out" / "metric.json"))
    assert 0.0 <= metric["mrr"]["MRR@10"] <= 1.0
    run_lines = open(tmp_path / "dev_out" / "run.tsv").read().splitlines()
    assert run_lines and all(len(l.split("\t")) == 6 for l in run_lines)


def test_dense_eval_cli_trecdl_graded(prepared_dir, tiny_model, tmp_path):
    from repconc_tpu.cli import run_dense_eval

    run_dense_eval.main([
        "--model_name_or_path", str(tiny_model),
        "--corpus_path", str(prepared_dir / "corpus.tsv"),
        "--query_path", str(prepared_dir / "msmarco-test2019-queries.tsv"),
        "--qrel_path", str(prepared_dir / "2019qrels-pass.txt"),
        "--out_corpus_dir", str(tmp_path / "corpus_out"),
        "--out_query_dir", str(tmp_path / "trec19_out"),
        "--pooling", "mean", "--similarity_metric", "METRIC_IP",
        "--max_seq_length", "32", "--topk", "5",
        "--relevance_level", "2"])
    metric = json.load(open(tmp_path / "trec19_out" / "metric.json"))
    assert "NDCG@10" in metric["ndcg"]


def test_dense_eval_cli_beir(tiny_model, tmp_path):
    from repconc_tpu.cli import run_dense_eval

    beir = os.path.join(FIXTURES, "beir", "scifact")
    run_dense_eval.main([
        "--model_name_or_path", str(tiny_model),
        "--corpus_path", os.path.join(beir, "corpus.jsonl"),
        "--query_path", os.path.join(beir, "queries.jsonl"),
        "--qrel_path", os.path.join(beir, "qrels", "test.tsv"),
        "--data_format", "beir",
        "--out_corpus_dir", str(tmp_path / "corpus_out"),
        "--out_query_dir", str(tmp_path / "test_out"),
        "--pooling", "mean", "--similarity_metric", "METRIC_IP",
        "--max_seq_length", "32", "--topk", "3"])
    metric = json.load(open(tmp_path / "test_out" / "metric.json"))
    assert 0.0 <= metric["recall"]["Recall@100"] <= 1.0
