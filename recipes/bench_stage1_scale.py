"""Time one stage-1 train step at the reference's production scale.

The reference's stage-1 configuration is global batch 4096 queries with 11
hard negatives + 1 positive each — ~49k encoded docs per step — run on
8xV100 for 3.5h via GradCache two-pass chunking
(reference: examples/tas-balanced/repconc/7_run_conc_train.sh:15-20,
examples/tas-balanced/repconc/README.md:11). This script proves the same
global step compiles and fits on TPU and measures ms/step: a full bert-base
joint step (encoders fwd+bwd with checkpointed chunking, Sinkhorn-constrained
quantization over the 49k-doc batch, global contrastive loss with
false-negative/duplicate masks, two optimizer groups).

On one chip the step IS the reference's whole global batch (no gradient
accumulation); over a mesh the identical program shards via --data_parallel
(tests/test_multichip.py proves sharded==single parity at small sizes).

Usage: python recipes/bench_stage1_scale.py [--batch 4096] [--negs 11]
       [--cache_chunk 512] [--dtype bfloat16] [--steps 3]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--negs", type=int, default=11)
    # 128 measured safe for the 49k-doc step on one 16 GB chip (chunk 512's
    # rematerialized bert-base chunk backward alone holds ~12 GB)
    ap.add_argument("--cache_chunk", type=int, default=128)
    ap.add_argument("--query_len", type=int, default=16)
    ap.add_argument("--doc_len", type=int, default=128)
    ap.add_argument("--M", type=int, default=48)
    ap.add_argument("--dtype", default="bfloat16",
                    help="encoder activation dtype (bfloat16|float32)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--analyze", action="store_true",
                    help="AOT-compile only and print XLA's HBM analysis")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repconc_tpu.core.config import EncoderConfig, RepConcConfig
    from repconc_tpu.models import repconc_model
    from repconc_tpu.train import stage1

    B, NEG, LQ, LD = args.batch, args.negs, args.query_len, args.doc_len
    n_docs = B * (1 + NEG)
    enc = EncoderConfig(dtype=args.dtype)  # bert-base architecture defaults
    cfg = RepConcConfig(encoder=enc, MCQ_M=args.M, MCQ_K=256,
                        sk_epsilon=0.003, sk_iters=100)
    params = repconc_model.init_params(cfg, jax.random.key(0))
    hp = stage1.Stage1Hparams(
        cache_chunk_size=args.cache_chunk, total_steps=10000,
        negative_per_query=NEG, mse_loss_weight=1e-4, temperature=1.0)
    import optax  # noqa: F401 (tx built by stage1)
    tx = stage1.make_optimizer(hp, params)
    opt_state = tx.init(params)
    step_fn = jax.jit(stage1.make_train_step(cfg, hp, tx),
                      donate_argnums=(0, 1))

    rng = np.random.default_rng(0)

    def tok(n, L):
        ids = rng.integers(5, enc.vocab_size, size=(n, L)).astype(np.int32)
        return ids, np.ones((n, L), np.int32)

    q_ids, q_mask = tok(B, LQ)
    p_ids, p_mask = tok(B, LD)
    n_ids, n_mask = tok(B * NEG, LD)
    positives = np.full((B, 4), -1, np.int32)
    positives[:, 0] = np.arange(B)
    batch = {
        "query_input_ids": q_ids, "query_attention_mask": q_mask,
        "pos_input_ids": p_ids, "pos_attention_mask": p_mask,
        "neg_input_ids": n_ids, "neg_attention_mask": n_mask,
        "qids": np.arange(B, dtype=np.int32),
        "pos_docids": np.arange(B, dtype=np.int32),
        "neg_docids": rng.integers(B, 10 * n_docs,
                                   size=(B * NEG,)).astype(np.int32),
        "query_positives": positives,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.key(0)

    print(f"compiling: B={B} negs={NEG} docs/step={n_docs} "
          f"chunk={args.cache_chunk} Lq={LQ} Ld={LD} dtype={args.dtype}")
    if args.analyze:
        compiled = step_fn.lower(params, opt_state, batch, key).compile()
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        print(f"peak HBM: args {ma.argument_size_in_bytes/gb:.2f} GB + "
              f"output {ma.output_size_in_bytes/gb:.2f} GB (aliased "
              f"{ma.alias_size_in_bytes/gb:.2f} GB) + temp "
              f"{ma.temp_size_in_bytes/gb:.2f} GB")
        return

    t0 = time.perf_counter()
    params, opt_state, metrics, key = step_fn(params, opt_state, batch, key)
    loss = float(metrics["loss"])  # scalar readback = completion barrier
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s  loss={loss:.4f}")

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        params, opt_state, metrics, key = step_fn(params, opt_state, batch, key)
        loss = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"step time: min {best*1e3:.0f} ms  all {[f'{t:.2f}' for t in times]}  "
          f"loss={loss:.4f}")
    print(f"throughput: {B/best:.0f} queries/s/chip, {n_docs/best:.0f} "
          f"encoded docs/s/chip")


if __name__ == "__main__":
    main()
