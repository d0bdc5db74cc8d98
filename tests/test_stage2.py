"""Stage-2 (JPQ) trainer tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from repconc_tpu.core.config import EncoderConfig, RepConcConfig
from repconc_tpu.models import repconc_model
from repconc_tpu.train import stage1, stage2
from repconc_tpu.train.stage2 import Stage2Hparams, make_train_step

TINY_ENC = EncoderConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=64,
                         hidden_dropout=0.0, attention_dropout=0.0)


@pytest.fixture
def setup(rng):
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    N = 64
    codes = rng.integers(0, 16, size=(N, 4)).astype(np.uint8)
    return cfg, params, codes


def make_query_batch(rng, B=8, Lq=8, n_docs=64):
    ids = rng.integers(4, 64, size=(B, Lq)).astype(np.int32)
    mask = np.ones((B, Lq), dtype=np.int32)
    pos = rng.integers(0, n_docs, size=(B,)).astype(np.int32)
    positives = np.full((B, 4), -1, dtype=np.int32)
    positives[:, 0] = pos
    return {
        "query_input_ids": ids, "query_attention_mask": mask,
        "qids": np.arange(B, dtype=np.int32),
        "pos_docids": pos, "query_positives": positives,
    }


def test_train_step_runs_and_learns(setup, rng):
    cfg, params, codes = setup
    hp = Stage2Hparams(learning_rate=1e-3, centroid_learning_rate=5e-3,
                       dynamic_topk_negative=8, total_steps=25)
    tx = stage1.make_optimizer(hp.as_stage1(), params)
    opt_state = tx.init(params)
    step_fn, codes_dev = make_train_step(cfg, hp, tx, codes)
    step = jax.jit(step_fn)
    batch = {k: jnp.asarray(v) for k, v in make_query_batch(rng).items()}
    key = jax.random.key(0)
    cent0 = np.asarray(params["centroids"]).copy()
    first = None
    for _ in range(25):
        params, opt_state, metrics, key = step(params, opt_state, batch, key,
                                               codes_dev)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first, (first, last)
    # centroids moved (gradients flow through frozen-code decode)
    assert np.abs(np.asarray(params["centroids"]) - cent0).max() > 1e-4


def test_positive_masking(setup, rng):
    """A retrieved positive must not contribute as a negative: loss with the
    true positive excluded from negatives <= loss without masking."""
    cfg, params, codes = setup
    hp = Stage2Hparams(dynamic_topk_negative=64, total_steps=1)  # retrieve ALL
    tx = stage1.make_optimizer(hp.as_stage1(), params)
    opt_state = tx.init(params)
    step_fn, codes_dev = make_train_step(cfg, hp, tx, codes)
    step = jax.jit(step_fn)
    batch = make_query_batch(rng)
    # with k = N, every positive IS retrieved; masking must keep loss finite
    # and bounded by log(N) (unmasked CE with duplicate positive can exceed it)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    _, _, metrics, _ = step(params, opt_state, b, jax.random.key(0), codes_dev)
    assert np.isfinite(float(metrics["loss"]))


def test_stage2_loop_with_eval(setup, rng, tmp_path):
    cfg, params, codes = setup
    hp = Stage2Hparams(total_steps=4, logging_steps=2, dynamic_topk_negative=8)

    def batches():
        while True:
            yield make_query_batch(rng)

    out = stage2.train(cfg, params, codes, batches(), hp, str(tmp_path))
    assert out["step"] == 4
    assert (tmp_path / "final" / "params.msgpack").exists()
    # resume
    out2 = stage2.train(cfg, params, codes, batches(), hp, str(tmp_path))
    assert out2["step"] == 4


def test_query_dataset_offsets(tmp_path):
    from repconc_tpu.train.data import QueryDataset

    (tmp_path / "queries.tsv").write_text("q0\thello\nq1\tworld\n")
    (tmp_path / "qrels.txt").write_text("q0 0 dA 1\nq1 0 dB 1\nq1 0 dZ 1\n")
    index_ids = np.array(["dB", "dA"])  # index order differs from qrels
    ds = QueryDataset(str(tmp_path / "qrels.txt"), str(tmp_path / "queries.tsv"),
                      index_ids)
    assert ds.qrels[0] == [1]  # dA is at index offset 1
    assert ds.qrels[1] == [0]  # dB at offset 0; dZ not in index -> dropped


def test_pallas_retrieval_branch_matches_xla(rng):
    """The use_pallas_search branch (the one the TPU rehearsal serves with,
    stage2.make_train_step:95-123) must produce the same training step as the
    XLA scoring branch — covers the code-padding path (N not a multiple of
    DOC_TILE) and the QUERY_TILE LUT padding. On CPU the kernel runs in
    interpret mode automatically."""
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=32)
    params = repconc_model.init_params(cfg, jax.random.key(1))
    N = 300  # deliberately not a multiple of DOC_TILE (128)
    codes = rng.integers(0, 32, size=(N, 4)).astype(np.uint8)
    hp_x = Stage2Hparams(dynamic_topk_negative=8, total_steps=1,
                         use_pallas_search=False)
    hp_p = Stage2Hparams(dynamic_topk_negative=8, total_steps=1,
                         use_pallas_search=True)
    batch = {k: jnp.asarray(v) for k, v in
             make_query_batch(rng, n_docs=N).items()}

    outs = {}
    for name, hp in (("xla", hp_x), ("pallas", hp_p)):
        tx = stage1.make_optimizer(hp.as_stage1(), params)
        opt_state = tx.init(params)
        step_fn, codes_dev = make_train_step(cfg, hp, tx, codes)
        step = jax.jit(step_fn)
        p2, _, metrics, _ = step(dict(params), opt_state, batch,
                                 jax.random.key(0), codes_dev)
        outs[name] = (float(metrics["loss"]), np.asarray(p2["centroids"]))

    # bf16 LUT in the kernel vs fp32 XLA scoring: the retrieved top-8 sets
    # coincide away from ties, so loss and the updated centroids agree to
    # bf16-level tolerance
    assert np.isclose(outs["xla"][0], outs["pallas"][0], rtol=2e-2), outs
    np.testing.assert_allclose(outs["pallas"][1], outs["xla"][1],
                               rtol=5e-2, atol=5e-4)
