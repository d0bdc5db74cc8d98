"""Stage-1 trainer tests: gradient-cache equivalence, param groups, learning."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from repconc_tpu.core.config import EncoderConfig, RepConcConfig
from repconc_tpu.models import repconc_model
from repconc_tpu.train import stage1
from repconc_tpu.train.stage1 import (
    Stage1Hparams, encode_chunked, make_optimizer, make_train_step,
    make_quant_health_fn,
)

TINY_ENC = EncoderConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=64,
                         hidden_dropout=0.0, attention_dropout=0.0)


@pytest.fixture
def tiny():
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16,
                        sk_epsilon=0.05, sk_iters=20)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    return cfg, params


def make_batch(rng, B=8, n_neg=2, Lq=8, Ld=12):
    def tok(B_, L):
        ids = rng.integers(4, 64, size=(B_, L)).astype(np.int32)
        mask = np.ones((B_, L), dtype=np.int32)
        return ids, mask

    q_ids, q_mask = tok(B, Lq)
    p_ids, p_mask = tok(B, Ld)
    n_ids, n_mask = tok(B * n_neg, Ld)
    pos_docids = np.arange(B, dtype=np.int32)
    positives = np.full((B, 4), -1, dtype=np.int32)
    positives[:, 0] = pos_docids
    return {
        "query_input_ids": q_ids, "query_attention_mask": q_mask,
        "pos_input_ids": p_ids, "pos_attention_mask": p_mask,
        "neg_input_ids": n_ids, "neg_attention_mask": n_mask,
        "qids": np.arange(B, dtype=np.int32),
        "pos_docids": pos_docids,
        "neg_docids": rng.integers(B, 100, size=(B * n_neg,)).astype(np.int32),
        "query_positives": positives,
    }


def test_encode_chunked_matches_unchunked(tiny, rng):
    """The gradient-cache path must produce IDENTICAL values and grads."""
    cfg, params = tiny
    ids = jnp.asarray(rng.integers(4, 64, size=(16, 8)), dtype=jnp.int32)
    mask = jnp.ones((16, 8), dtype=jnp.int32)

    full = repconc_model.encode_continuous(cfg, params, ids, mask)
    chunked = encode_chunked(cfg, params, ids, mask, chunk_size=4,
                             train=False, dropout_rng=None)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-5, atol=1e-6)

    def loss_full(p):
        return jnp.sum(repconc_model.encode_continuous(cfg, p, ids, mask) ** 2)

    def loss_chunked(p):
        return jnp.sum(encode_chunked(cfg, p, ids, mask, 4, False, None) ** 2)

    g1 = jax.grad(loss_full)(params)
    g2 = jax.grad(loss_chunked)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5), g1, g2)


def test_optimizer_param_groups(tiny):
    cfg, params = tiny
    hp = Stage1Hparams(learning_rate=1e-3, centroid_learning_rate=1.0,
                       warmup_steps=0, total_steps=100, max_grad_norm=1e9,
                       weight_decay=0.0)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # centroid update magnitude ~ centroid_lr, encoder update ~ base lr
    cent_up = float(jnp.abs(updates["centroids"]).mean())
    enc_up = float(jnp.abs(
        updates["encoder"]["transformer"]["layer_0"]["mlp_up"]["kernel"]).mean())
    assert cent_up > 100 * enc_up, (cent_up, enc_up)


def test_rotation_frozen_and_single_global_clip(tiny):
    """The OPQ rotation is a frozen buffer (reference modeling_repconc.py:40):
    no update regardless of its gradient; clipping is one global norm."""
    cfg, params = tiny
    hp = Stage1Hparams(learning_rate=1e-3, centroid_learning_rate=1e-3,
                       warmup_steps=0, total_steps=100, max_grad_norm=1.0)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["rotation"]).max()) == 0.0
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new_params["rotation"]),
                                  np.asarray(params["rotation"]))
    # rotation stays orthogonal after many noisy steps
    for i in range(5):
        g = jax.tree.map(lambda x: jnp.ones_like(x) * (i + 1), params)
        updates, opt_state = tx.update(g, opt_state, new_params)
        new_params = optax.apply_updates(new_params, updates)
    r = np.asarray(new_params["rotation"])
    np.testing.assert_allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-5)


def test_train_step_decreases_loss(tiny, rng):
    cfg, params = tiny
    hp = Stage1Hparams(learning_rate=5e-4, centroid_learning_rate=1e-3,
                       total_steps=30, use_constraint=True,
                       mse_loss_weight=0.01, warmup_steps=0)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(cfg, hp, tx))
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng).items()}
    key = jax.random.key(0)
    first = None
    for i in range(30):
        params, opt_state, metrics, key = step(params, opt_state, batch, key)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_train_step_inbatch_negatives(tiny, rng):
    cfg, params = tiny
    hp = Stage1Hparams(total_steps=10, use_constraint=False)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(cfg, hp, tx))
    batch = make_batch(rng)
    for k in ("neg_input_ids", "neg_attention_mask", "neg_docids"):
        del batch[k]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params, opt_state, metrics, _ = step(params, opt_state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_centroid_cos_renormalized_after_step(rng):
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16,
                        similarity_metric="METRIC_CENTROID_COS",
                        sk_epsilon=0.05, sk_iters=10)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    hp = Stage1Hparams(total_steps=5, centroid_learning_rate=0.1)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(cfg, hp, tx))
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng).items()}
    params, *_ = step(params, opt_state, batch, jax.random.key(1))
    norms = np.linalg.norm(np.asarray(params["centroids"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_quant_health(tiny, rng):
    cfg, params = tiny
    fn = make_quant_health_fn(cfg)
    # health fn now takes the tokenized batch (encode runs inside the jit)
    ids = jnp.asarray(rng.integers(4, cfg.encoder.vocab_size, size=(64, 8)),
                      dtype=jnp.int32)
    mask = jnp.ones((64, 8), dtype=jnp.int32)
    h = {k: float(v) for k, v in fn(params, ids, mask).items()}
    # constraint must balance codes better than plain argmin
    assert h["w_conc_avg_imbalance"] <= h["wo_conc_avg_imbalance"] + 1e-6
    assert h["w_conc_rmse"] >= h["wo_conc_rmse"] - 1e-6


def test_train_loop_end_to_end(tiny, rng, tmp_path):
    """Host loop: runs N steps, checkpoints, resumes."""
    cfg, params = tiny
    hp = Stage1Hparams(total_steps=6, logging_steps=2, save_steps=3,
                       use_constraint=False)

    def batches():
        while True:
            yield make_batch(rng)

    out = stage1.train(cfg, params, batches(), hp, str(tmp_path))
    assert out["step"] == 6
    assert len(out["history"]) == 3
    assert (tmp_path / "final" / "params.msgpack").exists()

    # resume: a fresh call continues from step 6 and stops immediately
    out2 = stage1.train(cfg, params, batches(), hp, str(tmp_path))
    assert out2["step"] == 6


def test_checkpoint_lands_before_eval(tiny, rng, tmp_path, monkeypatch):
    """When a save is due at an eval step, the train_state must be on disk
    BEFORE the eval runs: the eval's first call compiles fresh programs,
    and on the remote-compile tunnel a compile can wedge until the process
    is killed — the retry must resume from the eval boundary, not step 0."""
    cfg, params = tiny
    hp = Stage1Hparams(total_steps=4, logging_steps=0, eval_steps=2,
                       save_steps=2, use_constraint=False)

    def wedged_eval(*a, **k):
        raise RuntimeError("simulated wedged eval compile")

    from repconc_tpu.eval import pipeline as eval_pipeline
    monkeypatch.setattr(eval_pipeline, "evaluate_repconc_model", wedged_eval)
    monkeypatch.setattr(eval_pipeline, "evaluate_dense_model", wedged_eval)

    def batches():
        while True:
            yield make_batch(rng)

    valid_set = ({"d0": "doc"}, {"q0": "query"}, {"q0": {"d0": 1}})
    with pytest.raises(RuntimeError, match="simulated"):
        stage1.train(cfg, params, batches(), hp, str(tmp_path),
                     valid_set=valid_set)
    import json
    meta = json.load(open(tmp_path / "checkpoint" / "trainer_meta.json"))
    assert meta["step"] == 2  # saved AT the eval step, before the eval ran
    assert (tmp_path / "checkpoint" / "train_state.msgpack").exists()


def test_train_resumes_fresh_on_corrupt_state(tiny, rng, tmp_path):
    """A truncated train_state.msgpack (killed run) must restart training
    from step 0 with a warning — not raise on every retry of an unattended
    driver loop."""
    cfg, params = tiny
    hp = Stage1Hparams(total_steps=2, logging_steps=1, use_constraint=False)

    def batches():
        while True:
            yield make_batch(rng)

    stage1.train(cfg, params, batches(), hp, str(tmp_path))
    (tmp_path / "checkpoint" / "train_state.msgpack").write_bytes(b"\x93trunc")
    out = stage1.train(cfg, params, batches(), hp, str(tmp_path))
    assert out["step"] == 2  # ran again from 0, not resumed-and-skipped


def test_train_state_orbax_roundtrip(tiny, tmp_path):
    """Optional orbax checkpoint backend restores bit-identically."""
    pytest.importorskip("orbax.checkpoint")
    cfg, params = tiny
    hp = Stage1Hparams(total_steps=3)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    stage1.save_train_state(str(tmp_path), params, opt_state, 7, 0.5,
                            backend="orbax")
    p2, o2, step, best = stage1.load_train_state(str(tmp_path), params, opt_state)
    assert step == 7 and best == 0.5
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, p2)
