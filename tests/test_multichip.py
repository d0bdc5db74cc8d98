"""Sharded training-step tests on the virtual 8-device mesh (GSPMD path)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from repconc_tpu.core.config import EncoderConfig, RepConcConfig
from repconc_tpu.models import repconc_model
from repconc_tpu.train.stage1 import Stage1Hparams, make_optimizer, make_train_step
from tests.test_stage1 import TINY_ENC, make_batch


def test_sharded_train_step_runs_and_matches_single(rng):
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16,
                        sk_epsilon=0.05, sk_iters=10)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    hp = Stage1Hparams(total_steps=4, use_constraint=True)
    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, B=16, n_neg=1).items()}
    key = jax.random.key(7)

    # single-device reference
    step_single = jax.jit(make_train_step(cfg, hp, tx))
    p1, o1, m1, _ = step_single(params, opt_state, batch, key)

    # 8-device data-sharded
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    step_sharded = jax.jit(make_train_step(cfg, hp, tx),
                           in_shardings=(repl, repl, data, repl),
                           out_shardings=(repl, repl, repl, repl))
    p2, o2, m2, _ = step_sharded(params, opt_state, batch, key)

    # loss identical (global-batch semantics preserved under sharding)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # parameters agree to fp tolerance
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5),
        p1, p2)


def test_sharded_with_gradient_cache_chunks(rng):
    """cache_chunk_size (gradient caching) must compose with data sharding
    — the combination every real recipe uses (GLOBAL_BATCH + CACHE_CHUNK +
    --data_parallel)."""
    cfg = RepConcConfig(encoder=TINY_ENC, MCQ_M=4, MCQ_K=16,
                        sk_epsilon=0.05, sk_iters=10)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, B=32, n_neg=1).items()}
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))

    losses = {}
    for chunk in (-1, 8):
        hp = Stage1Hparams(total_steps=1, use_constraint=True,
                           cache_chunk_size=chunk)
        tx = make_optimizer(hp, params)
        step = jax.jit(make_train_step(cfg, hp, tx),
                       in_shardings=(repl, repl, data, repl),
                       out_shardings=(repl, repl, repl, repl))
        _, _, m, _ = step(params, tx.init(params), batch, jax.random.key(0))
        losses[chunk] = float(m["loss"])
    assert abs(losses[-1] - losses[8]) < 1e-3, losses


def test_stage2_sharded_step_matches_single(rng):
    """dp-sharded stage-2 step == single-device step (codes replicated,
    query batch sharded; the reference's stage-2 is single-GPU only)."""
    from repconc_tpu.train import stage1 as s1, stage2 as s2
    from tests.test_stage2 import TINY_ENC as T2_ENC, make_query_batch

    cfg = RepConcConfig(encoder=T2_ENC, MCQ_M=4, MCQ_K=16)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    codes = rng.integers(0, 16, size=(64, 4)).astype(np.uint8)
    hp = s2.Stage2Hparams(total_steps=2, dynamic_topk_negative=8,
                          learning_rate=1e-3, centroid_learning_rate=1e-3)
    tx = s1.make_optimizer(hp.as_stage1(), params)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in make_query_batch(rng, B=16).items()}
    key = jax.random.key(3)

    sfn, cdev = s2.make_train_step(cfg, hp, tx, codes)
    step_single = jax.jit(sfn)
    p1, o1, m1, _ = step_single(params, opt_state, batch, key, cdev)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    sfn_sh, cdev_sh = s2.make_train_step(cfg, hp, tx, codes, mesh=mesh)
    step_sharded = jax.jit(sfn_sh,
                           in_shardings=(repl, repl, data, repl, repl),
                           out_shardings=(repl, repl, repl, repl))
    p2, o2, m2, _ = step_sharded(params, opt_state, batch, key, cdev_sh)

    # loss and gradient norm must agree (same retrieval, same global loss);
    # params are NOT compared element-wise — Adam amplifies O(1e-9)
    # reduction-order noise on near-zero gradient elements to ~lr-sized sign
    # flips, which says nothing about sharding correctness.
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-5)
    # centroid updates carry the dominant gradients — these must agree
    np.testing.assert_allclose(np.asarray(p1["centroids"]),
                               np.asarray(p2["centroids"]),
                               rtol=1e-3, atol=1e-5)
