"""Full 10-stage pipeline integration test through the CLI entry points.

Mirrors the reference recipe flow (examples/tas-balanced/README.md:44-72):
customize -> dense eval -> valid set -> warmup -> hardneg -> conc train ->
conc eval -> jpq train -> jpq eval, on a tiny toy model/corpus.
"""
import json
import os

import numpy as np
import pytest

pytest.importorskip("torch")

from repconc_tpu.cli import (
    run_customize_dense, run_dense_eval, run_extract_hardneg,
    run_gen_valid_set, run_repconc_eval, run_train_conc, run_train_jpq,
    run_warmup,
)

WORDS = [f"w{i:02d}" for i in range(30)]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """Build the toy model + dataset files once."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(11)  # isolate from torch RNG consumed by other tests
    root = tmp_path_factory.mktemp("pipeline")
    model_dir = root / "raw_model"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(model_dir / "vocab.txt"))
    tok.save_pretrained(model_dir)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, pad_token_id=0)
    BertModel(cfg, add_pooling_layer=False).save_pretrained(model_dir)

    data = root / "data"
    data.mkdir()
    rng = np.random.default_rng(5)
    with open(data / "corpus.tsv", "w") as f:
        for i in range(120):
            filler = " ".join(rng.choice(WORDS[15:], size=5))
            f.write(f"d{i}\t{WORDS[i % 15]} {filler}\n")
    with open(data / "queries.tsv", "w") as f:
        for i in range(30):
            f.write(f"q{i}\t{WORDS[i % 15]}\n")
    with open(data / "qrels.txt", "w") as f:
        for i in range(30):
            for j in range(120):
                if j % 15 == i % 15:
                    f.write(f"q{i} 0 d{j} 1\n")
    return root


def test_full_pipeline(env):
    root = env
    data = root / "data"

    # stage 2: customize
    run_customize_dense.main([
        "--model_name_or_path", str(root / "raw_model"),
        "--similarity_metric", "METRIC_COS", "--pooling", "mean",
        "--output_dir", str(root / "dense_model")])
    cfg = json.load(open(root / "dense_model" / "config.json"))
    assert cfg["pooling"] == "mean" and cfg["similarity_metric"] == "METRIC_COS"

    # stage 3: dense eval (saves corpus embeds for warmup)
    run_dense_eval.main([
        "--model_name_or_path", str(root / "dense_model"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "dense_out"),
        "--out_query_dir", str(root / "dense_out" / "dev"),
        "--max_seq_length", "32", "--topk", "50",
        "--save_corpus_embed", "--save_query_embed"])
    assert (root / "dense_out" / "corpus_embeds.npy").exists()
    dense_metrics = json.load(open(root / "dense_out" / "dev" / "metric.json"))
    assert "MRR@10" in dense_metrics["mrr"]

    # stage 4: validation set from the dense run
    run_gen_valid_set.main([
        "--input_corpus_path", str(data / "corpus.tsv"),
        "--input_query_path", str(data / "queries.tsv"),
        "--input_qrel_path", str(data / "qrels.txt"),
        "--input_run_path", str(root / "dense_out" / "dev" / "run.tsv"),
        "--topk", "10",
        "--output_corpus_path", str(root / "valid" / "corpus.tsv"),
        "--output_query_path", str(root / "valid" / "queries.tsv"),
        "--output_qrel_path", str(root / "valid" / "qrels.txt")])
    assert (root / "valid" / "corpus.tsv").exists()

    # stage 5: OPQ warmup
    run_warmup.main([
        "--model_name_or_path", str(root / "dense_model"),
        "--MCQ_M", "8", "--MCQ_K", "32",
        "--input_corpus_embed_path", str(root / "dense_out" / "corpus_embeds.npy"),
        "--input_corpus_ids_path", str(root / "dense_out" / "corpus_ids.npy"),
        "--output_model_dir", str(root / "warmup_model"),
        "--output_index_dir", str(root / "warmup_index"),
        "--opq_outer_iters", "4", "--opq_pq_iters", "2",
        "--final_pq_iters", "5"])
    codes = np.load(root / "warmup_index" / "codes.npy")
    assert codes.shape == (120, 8) and codes.dtype == np.uint8

    # stage 6: hard negatives from the dense run
    run_extract_hardneg.main([
        "--run_path", str(root / "dense_out" / "dev" / "run.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--topk", "20",
        "--output_path", str(root / "hardneg.json")])
    hardneg = json.load(open(root / "hardneg.json"))
    assert len(hardneg) > 0

    # stage 7: stage-1 joint training (few steps)
    run_train_conc.main([
        "--model_name_or_path", str(root / "warmup_model"),
        "--output_dir", str(root / "conc_out"),
        "--qrel_path", str(data / "qrels.txt"),
        "--query_path", str(data / "queries.tsv"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--valid_qrel_path", str(root / "valid" / "qrels.txt"),
        "--valid_query_path", str(root / "valid" / "queries.tsv"),
        "--valid_corpus_path", str(root / "valid" / "corpus.tsv"),
        "--max_query_len", "8", "--max_doc_len", "16",
        "--per_device_train_batch_size", "8",
        "--negative", str(root / "hardneg.json"),
        "--negative_per_query", "2",
        "--learning_rate", "1e-4", "--centroid_learning_rate", "1e-3",
        "--sk_epsilon", "0.05", "--sk_iters", "10",
        "--max_steps", "4", "--logging_steps", "2", "--eval_steps", "4"])
    assert (root / "conc_out" / "final" / "params.msgpack").exists()
    assert (root / "conc_out" / "best" / "params.msgpack").exists()

    # stage 8: repconc eval of the trained model
    run_repconc_eval.main([
        "--model_name_or_path", str(root / "conc_out" / "final"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "conc_eval"),
        "--out_query_dir", str(root / "conc_eval" / "dev"),
        "--max_seq_length", "32", "--topk", "20"])
    conc_metrics = json.load(open(root / "conc_eval" / "dev" / "metric.json"))
    assert "MRR@10" in conc_metrics["mrr"]

    # stage 9: JPQ training against the frozen stage-8 index
    run_train_jpq.main([
        "--model_name_or_path", str(root / "conc_out" / "final"),
        "--index_dir", str(root / "conc_eval"),
        "--qrel_path", str(data / "qrels.txt"),
        "--query_path", str(data / "queries.tsv"),
        "--valid_qrel_path", str(root / "valid" / "qrels.txt"),
        "--valid_query_path", str(root / "valid" / "queries.tsv"),
        "--max_query_len", "8",
        "--output_dir", str(root / "jpq_out"),
        "--per_device_train_batch_size", "8",
        "--learning_rate", "1e-4", "--centroid_learning_rate", "1e-3",
        "--dynamic_topk_negative", "16",
        "--max_steps", "4", "--logging_steps", "2", "--eval_steps", "4"])
    assert (root / "jpq_out" / "final" / "params.msgpack").exists()

    # stage 10: eval with stage-2 query encoder against stage-8 doc codes
    run_repconc_eval.main([
        "--doc_encoder_path", str(root / "conc_out" / "final"),
        "--query_encoder_path", str(root / "jpq_out" / "final"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "conc_eval"),  # codes cached from stage 8
        "--out_query_dir", str(root / "jpq_eval" / "dev"),
        "--max_seq_length", "32", "--topk", "20"])
    jpq_metrics = json.load(open(root / "jpq_eval" / "dev" / "metric.json"))
    assert "MRR@10" in jpq_metrics["mrr"]

    # IVF-indexed eval of the same model (beyond-reference path)
    run_repconc_eval.main([
        "--model_name_or_path", str(root / "conc_out" / "final"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "conc_eval"),
        "--out_query_dir", str(root / "ivf_eval" / "dev"),
        "--max_seq_length", "32", "--topk", "20",
        "--index_type", "ivf", "--nlist", "16", "--nprobe", "16",
        "--corpus_embed_path", str(root / "dense_out" / "corpus_embeds.npy")])
    ivf_metrics = json.load(open(root / "ivf_eval" / "dev" / "metric.json"))
    # full probe (nprobe == nlist): metrics match the flat eval exactly
    assert ivf_metrics["mrr"]["MRR@10"] == conc_metrics["mrr"]["MRR@10"], \
        (ivf_metrics["mrr"], conc_metrics["mrr"])

    # caching: rerunning stage 8 must be a no-op (skip-if-exists)
    run_repconc_eval.main([
        "--model_name_or_path", str(root / "conc_out" / "final"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "conc_eval"),
        "--out_query_dir", str(root / "conc_eval" / "dev"),
        "--max_seq_length", "32", "--topk", "20"])


def test_stage0_dense_pretrain(env):
    """Stage 0: run-free valid-set bootstrap + dense contrastive pre-training
    + HF export, and the exported checkpoint must reload as a dense encoder
    producing the same embeddings as the trained flax params."""
    import jax.numpy as jnp

    from repconc_tpu.cli import run_train_dense
    from repconc_tpu.models import repconc_model
    from repconc_tpu.models.auto import load_dense_encoder
    from repconc_tpu.models.transformer import DenseEncoder

    root = env
    data = root / "data"

    # run-free bootstrap valid set (judged + random pad)
    run_gen_valid_set.main([
        "--input_corpus_path", str(data / "corpus.tsv"),
        "--input_query_path", str(data / "queries.tsv"),
        "--input_qrel_path", str(data / "qrels.txt"),
        "--random_sample", "40",
        "--output_corpus_path", str(root / "valid0" / "corpus.tsv"),
        "--output_query_path", str(root / "valid0" / "queries.tsv"),
        "--output_qrel_path", str(root / "valid0" / "qrels.txt")])
    lines = open(root / "valid0" / "corpus.tsv").read().splitlines()
    assert 40 <= len(lines) <= 120

    run_train_dense.main([
        "--model_name_or_path", str(root / "raw_model"),
        "--output_dir", str(root / "dense_pretrain"),
        "--pooling", "mean", "--similarity_metric", "METRIC_IP",
        "--qrel_path", str(data / "qrels.txt"),
        "--query_path", str(data / "queries.tsv"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--valid_qrel_path", str(root / "valid0" / "qrels.txt"),
        "--valid_query_path", str(root / "valid0" / "queries.tsv"),
        "--valid_corpus_path", str(root / "valid0" / "corpus.tsv"),
        "--max_query_len", "8", "--max_doc_len", "16",
        "--per_device_train_batch_size", "8",
        "--learning_rate", "1e-4", "--warmup_steps", "2",
        "--max_steps", "4", "--logging_steps", "2", "--eval_steps", "4"])

    export = root / "dense_pretrain" / "export_hf"
    assert (export / "model.safetensors").exists()
    assert (export / "config.json").exists()
    assert (export / "vocab.txt").exists()

    # parity: exported HF checkpoint == trained flax params
    src = root / "dense_pretrain" / "best"
    if not src.exists():
        src = root / "dense_pretrain" / "final"
    cfg, params = repconc_model.from_pretrained(str(src))
    enc_cfg, enc_params, _ = load_dense_encoder(str(export))
    enc_cfg.pooling = cfg.encoder.pooling
    ids = jnp.asarray(np.arange(5, 13, dtype=np.int32)[None, :])
    mask = jnp.ones_like(ids)
    module = DenseEncoder(enc_cfg, "METRIC_IP")
    a = np.asarray(module.apply({"params": enc_params}, ids, mask))
    b = np.asarray(module.apply({"params": params["encoder"]}, ids, mask))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_data_parallel_eval_parity(env):
    """--data_parallel eval CLIs (dp-sharded encode + mesh-sharded search,
    reference: evaluate_repconc.py:121-153) must reproduce the single-device
    results on the virtual 8-device mesh: same codes, same metrics."""
    root = env
    data = root / "data"
    if not (root / "conc_out" / "final" / "params.msgpack").exists():
        pytest.skip("needs test_full_pipeline artifacts")

    # dense eval, sharded
    run_dense_eval.main([
        "--model_name_or_path", str(root / "dense_model"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "dense_dp"),
        "--out_query_dir", str(root / "dense_dp" / "dev"),
        "--max_seq_length", "32", "--topk", "50",
        "--save_corpus_embed", "--data_parallel"])
    e1 = np.load(root / "dense_out" / "corpus_embeds.npy")
    e2 = np.load(root / "dense_dp" / "corpus_embeds.npy")
    np.testing.assert_allclose(e2, e1, rtol=1e-4, atol=1e-5)
    m1 = json.load(open(root / "dense_out" / "dev" / "metric.json"))
    m2 = json.load(open(root / "dense_dp" / "dev" / "metric.json"))
    assert abs(m1["mrr"]["MRR@10"] - m2["mrr"]["MRR@10"]) < 0.02
    # full topk width even though topk(50) > N/W (120/8=15): the sharded
    # merge must widen back to the global topk, not the per-shard k
    from collections import Counter

    depth = Counter(line.split("\t")[0] for line in
                    open(root / "dense_dp" / "dev" / "run.tsv"))
    assert set(depth.values()) == {50}, depth.most_common(3)

    # repconc eval (flat ADC), sharded: re-encodes codes over the mesh
    run_repconc_eval.main([
        "--model_name_or_path", str(root / "conc_out" / "final"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "conc_dp"),
        "--out_query_dir", str(root / "conc_dp" / "dev"),
        "--max_seq_length", "32", "--topk", "20", "--data_parallel"])
    c1 = np.load(root / "conc_eval" / "codes.npy")
    c2 = np.load(root / "conc_dp" / "codes.npy")
    np.testing.assert_array_equal(c2, c1)  # argmin codes: exact
    m1 = json.load(open(root / "conc_eval" / "dev" / "metric.json"))
    m2 = json.load(open(root / "conc_dp" / "dev" / "metric.json"))
    assert abs(m1["mrr"]["MRR@10"] - m2["mrr"]["MRR@10"]) < 0.02


def test_beir_eval_end_to_end(env, tmp_path):
    """BEIR-format zero-shot eval through the CLI (recipes/beir_eval.sh
    flow; reference: examples/evaluate/repconc_eval_beir.sh): jsonl corpus +
    queries, tsv qrels with header, separate doc/query encoder dirs."""
    from repconc_tpu.models import repconc_model

    root = env
    # untrained RepCONC model around the toy encoder (eval only needs a
    # checkpoint, not a trained one)
    cfg, params = repconc_model.from_dense_encoder(
        str(root / "raw_model"), MCQ_M=8, MCQ_K=16,
        similarity_metric="METRIC_IP", pooling="mean")
    model_dir = tmp_path / "model"
    repconc_model.save_pretrained(str(model_dir), cfg, params,
                                  tokenizer_dir=str(root / "raw_model"))

    beir = tmp_path / "beir"
    (beir / "qrels").mkdir(parents=True)
    with open(beir / "corpus.jsonl", "w") as f:
        for i in range(40):
            f.write(json.dumps({"_id": f"doc{i}", "title": WORDS[i % 15],
                                "text": f"{WORDS[i % 15]} {WORDS[15 + i % 10]}"})
                    + "\n")
    with open(beir / "queries.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({"_id": f"bq{i}", "text": WORDS[i % 15]}) + "\n")
    with open(beir / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(10):
            for j in range(40):
                if j % 15 == i % 15:
                    f.write(f"bq{i}\tdoc{j}\t1\n")

    out = tmp_path / "out"
    run_repconc_eval.main([
        "--model_name_or_path", str(model_dir),
        "--corpus_path", str(beir / "corpus.jsonl"),
        "--query_path", str(beir / "queries.jsonl"),
        "--qrel_path", str(beir / "qrels" / "test.tsv"),
        "--out_corpus_dir", str(out),
        "--out_query_dir", str(out / "test"),
        "--data_format", "beir",
        "--max_seq_length", "32", "--topk", "20"])
    metrics = json.load(open(out / "test" / "metric.json"))
    assert "MRR@10" in metrics["mrr"]
    assert (out / "codes.npy").exists()
    # run.tsv qids/docids round-tripped as BEIR string ids (TREC columns)
    first = open(out / "test" / "run.tsv").readline().split()
    assert first[0].startswith("bq") and first[2].startswith("doc"), first


def test_ivf_eval_cli_and_stale_guard(env):
    """--index_type ivf through the eval CLI: builds the reconstruction-
    space IVF, metrics close to the flat-ADC run; rerunning with a
    different --nlist must REBUILD the cached index (stale-guard), not
    silently serve the old geometry."""
    root = env
    data = root / "data"
    if not (root / "conc_out" / "final" / "params.msgpack").exists():
        pytest.skip("needs test_full_pipeline artifacts")

    args = [
        "--model_name_or_path", str(root / "conc_out" / "final"),
        "--corpus_path", str(data / "corpus.tsv"),
        "--query_path", str(data / "queries.tsv"),
        "--qrel_path", str(data / "qrels.txt"),
        "--out_corpus_dir", str(root / "conc_ivf"),
        "--out_query_dir", str(root / "conc_ivf" / "dev"),
        "--max_seq_length", "32", "--topk", "20",
        "--index_type", "ivf", "--nprobe", "4"]
    run_repconc_eval.main(args + ["--nlist", "8"])
    import numpy as np2
    z = np2.load(root / "conc_ivf" / "ivf_index.npz")
    assert z["coarse_centroids"].shape[0] == 8
    m_ivf = json.load(open(root / "conc_ivf" / "dev" / "metric.json"))
    m_flat = json.load(open(root / "conc_eval" / "dev" / "metric.json"))
    # nprobe 4/8 cells probes half the corpus: near-flat quality
    assert abs(m_ivf["mrr"]["MRR@10"] - m_flat["mrr"]["MRR@10"]) < 0.15

    # stale guard: different --nlist must rebuild (metric.json cleared so
    # the search actually reruns)
    os.remove(root / "conc_ivf" / "dev" / "metric.json")
    run_repconc_eval.main(args + ["--nlist", "4"])
    z = np2.load(root / "conc_ivf" / "ivf_index.npz")
    assert z["coarse_centroids"].shape[0] == 4, "stale index served"

    # corruption guard: a partial npz from a killed run must trigger a
    # rebuild, not an unhandled zipfile error
    (root / "conc_ivf" / "ivf_index.npz").write_bytes(b"PK\x03\x04corrupt")
    os.remove(root / "conc_ivf" / "dev" / "metric.json")
    run_repconc_eval.main(args + ["--nlist", "4"])
    z = np2.load(root / "conc_ivf" / "ivf_index.npz")
    assert z["coarse_centroids"].shape[0] == 4, "corrupt index not rebuilt"


CLI_MODULES = [
    "run_customize_dense", "run_dense_eval", "run_extract_hardneg",
    "run_gen_valid_set", "run_ivf_sweep", "run_repconc_eval",
    "run_train_conc", "run_train_dense", "run_train_jpq", "run_warmup",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help_formats(name, capsys):
    """`--help` must render for every CLI: argparse %-formats help strings
    lazily, so a stray bare '%' crashes at HELP time (and on every argparse
    error message), not at definition time — caught live on --lut_dtype."""
    import importlib

    mod = importlib.import_module(f"repconc_tpu.cli.{name}")
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    assert "usage:" in capsys.readouterr().out
