"""Training data pipeline tests."""
import json

import numpy as np
import pytest

pytest.importorskip("torch")

from repconc_tpu.train.data import QDRelDataset, FinetuneCollator, batch_iterator


@pytest.fixture(scope="module")
def toy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("toydata")
    (d / "queries.tsv").write_text(
        "".join(f"q{i}\twhat is item {i}\n" for i in range(20)))
    (d / "corpus.tsv").write_text(
        "".join(f"d{i}\ttitle {i}\tbody text about item {i}\n" for i in range(50)))
    qrel_lines = []
    for i in range(20):
        qrel_lines.append(f"q{i} 0 d{i} 1\n")
        if i < 5:
            qrel_lines.append(f"q{i} 0 d{i + 30} 1\n")  # multi-positive
    (d / "qrels.txt").write_text("".join(qrel_lines))
    hardneg = {f"q{i}": [f"d{(i + 7) % 50}", f"d{(i + 9) % 50}",
                         f"d{(i + 11) % 50}"] for i in range(20)}
    (d / "hardneg.json").write_text(json.dumps(hardneg))
    return d


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("tok")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        [f"item{i}" for i in range(5)] + \
        ["what", "is", "item", "title", "body", "text", "about"] + \
        [str(i) for i in range(50)]
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


def test_dataset_loading(toy_files):
    ds = QDRelDataset(str(toy_files / "qrels.txt"), str(toy_files / "queries.tsv"),
                      str(toy_files / "corpus.tsv"), negative="random",
                      negative_per_query=2)
    assert len(ds) == 20
    assert len(ds.corpus) == 50
    # multi-positive queries carry both positives
    assert len(ds.qrels[0]) == 2
    # corpus text fields joined by sep token
    assert "[SEP]" in ds.corpus[0]


def test_sampling_random_negatives(toy_files):
    import random

    ds = QDRelDataset(str(toy_files / "qrels.txt"), str(toy_files / "queries.tsv"),
                      str(toy_files / "corpus.tsv"), negative="random",
                      negative_per_query=3)
    s = ds.sample(0, random.Random(0))
    assert s["pos_docid"] in ds.qrels[0]
    assert len(s["neg_docids"]) == 3


def test_sampling_hard_negatives(toy_files):
    import random

    ds = QDRelDataset(str(toy_files / "qrels.txt"), str(toy_files / "queries.tsv"),
                      str(toy_files / "corpus.tsv"),
                      negative=str(toy_files / "hardneg.json"),
                      negative_per_query=2)
    s = ds.sample(3, random.Random(0))
    # negatives drawn from the hardneg pool for q3: offsets of d10, d12, d14
    assert set(s["neg_docids"]) <= {10, 12, 14}


def test_collator_shapes(toy_files, tokenizer):
    import random

    ds = QDRelDataset(str(toy_files / "qrels.txt"), str(toy_files / "queries.tsv"),
                      str(toy_files / "corpus.tsv"), negative="random",
                      negative_per_query=2)
    coll = FinetuneCollator(tokenizer, max_query_len=16, max_doc_len=24,
                            max_positives=4)
    r = random.Random(0)
    samples = [ds.sample(q, r) for q in ds.qids[:4]]
    batch = coll(samples, ds.qrels)
    assert batch["query_input_ids"].shape == (4, 16)
    assert batch["pos_input_ids"].shape == (4, 24)
    assert batch["neg_input_ids"].shape == (8, 24)
    assert batch["query_positives"].shape == (4, 4)
    # every row's first positive is a real qrel of that query
    for i, s in enumerate(samples):
        assert batch["query_positives"][i, 0] in ds.qrels[s["qid"]]


def test_padded_positives_always_contains_sampled_positive():
    """Even when a query's judged positives overflow max_positives, the
    SAMPLED positive (the contrastive label's doc) occupies column 0."""
    from repconc_tpu.train.data import padded_positives

    qrels = {7: list(range(100, 112))}  # 12 positives, P=4
    samples = [{"qid": 7, "pos_docid": 111}]  # sampled is LAST in qrels order
    m = padded_positives(samples, qrels, max_positives=4)
    assert m.shape == (1, 4)
    assert m[0, 0] == 111
    assert set(m[0, 1:]) == {100, 101, 102}  # remaining prefix, no duplicate


def test_batch_iterator_static_shapes(toy_files, tokenizer):
    ds = QDRelDataset(str(toy_files / "qrels.txt"), str(toy_files / "queries.tsv"),
                      str(toy_files / "corpus.tsv"), negative="random",
                      negative_per_query=1)
    coll = FinetuneCollator(tokenizer, 16, 24)
    it = batch_iterator(ds, coll, batch_size=8, num_epochs=2, seed=1)
    batches = list(it)
    assert len(batches) == 4  # 20 // 8 = 2 per epoch, 2 epochs
    for b in batches:
        assert b["query_input_ids"].shape == (8, 16)

    # determinism under the same seed
    it2 = batch_iterator(ds, coll, batch_size=8, num_epochs=1, seed=1)
    b0 = next(it2)
    np.testing.assert_array_equal(b0["qids"], batches[0]["qids"])
