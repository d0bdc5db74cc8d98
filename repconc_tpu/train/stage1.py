"""Stage-1 RepCONC joint training: encoders + centroids under the constraint.

TPU-native rebuild of the reference's RepCONCFinetuner
(models/repconc/finetune_repconc.py:225-613). Key re-architecture decisions:

* The GradCache two-pass scheme (forward_no_grad -> build_cache -> replayed
  forward with surrogate dot products, finetune_repconc.py:278-396) collapses
  into ONE jitted loss function: chunked encoding runs under `lax.map` with
  `jax.checkpoint`, so the backward pass recomputes each chunk's activations
  — identical memory profile and gradients to gradient caching, with no RNG
  state juggling (JAX PRNG keys are replayed exactly by construction).
* The surrogate trick (grads into both continuous and quantized paths,
  finetune_repconc.py:368-373) is the `straight_through` custom_vjp.
* DDP all_gathers + Sinkhorn all_reduces become GSPMD: the step is written
  over the GLOBAL batch and jitted with the batch sharded over the mesh's
  data axis; XLA inserts the collectives. On one device it's a no-op.
* Two optimizer groups (AdamW for the encoder with HF-style decay masking,
  Adam at centroid_learning_rate for the codebook,
  finetune_repconc.py:476-528) via optax.multi_transform.
"""
from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from repconc_tpu.core.config import METRIC_CENTROID_COS, RepConcConfig
from repconc_tpu.models import repconc_model
from repconc_tpu.quant import codebook, losses

logger = logging.getLogger(__name__)


@dataclass
class Stage1Hparams:
    """Mirrors RepCONCFinetuneArguments (finetune_repconc.py:44-58)."""

    learning_rate: float = 2e-5
    centroid_learning_rate: float = 5e-4
    weight_decay: float = 0.01
    warmup_steps: int = 0
    total_steps: int = 10000
    temperature: float = 1.0
    mse_loss_weight: float = 0.0
    negative_per_query: int = 1
    dynamic_topk_hard_negative: Optional[int] = None
    use_constraint: bool = True
    quantize: bool = True               # False: dense pre-training (stage 0)
    cache_chunk_size: int = -1          # -1: no chunking (plain large batch)
    max_grad_norm: float = 1.0
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    seed: int = 2022
    logging_steps: int = 20
    eval_steps: int = 0                 # 0: no in-training eval
    save_steps: int = 0


def _decay_mask(params) -> Any:
    """HF-style: no weight decay for biases and LayerNorm params
    (finetune_repconc.py:485-502)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        if "bias" in keys:
            return False
        if any(k.endswith("_ln") or k == "scale" for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def make_optimizer(hp: Stage1Hparams, params) -> optax.GradientTransformation:
    base_lr = optax.linear_schedule(0.0, hp.learning_rate, max(hp.warmup_steps, 1))
    decay = optax.linear_schedule(hp.learning_rate, 0.0,
                                  max(hp.total_steps - hp.warmup_steps, 1))
    lr = optax.join_schedules([base_lr, decay], [hp.warmup_steps])
    cent_warm = optax.linear_schedule(0.0, hp.centroid_learning_rate,
                                      max(hp.warmup_steps, 1))
    cent_decay = optax.linear_schedule(hp.centroid_learning_rate, 0.0,
                                       max(hp.total_steps - hp.warmup_steps, 1))
    cent_lr = optax.join_schedules([cent_warm, cent_decay], [hp.warmup_steps])

    base = optax.adamw(lr, b2=hp.adam_beta2, eps=hp.adam_epsilon,
                       weight_decay=hp.weight_decay, mask=_decay_mask)
    centroid = optax.adam(cent_lr, b2=hp.adam_beta2, eps=hp.adam_epsilon)
    labels = jax.tree_util.tree_map(lambda _: "base", params)
    labels["centroids"] = "centroid"
    # The OPQ rotation is a frozen buffer in the reference
    # (modeling_repconc.py:40, excluded from optimizer groups): updating it —
    # especially with weight decay — would denormalize the orthogonal matrix.
    labels["rotation"] = "frozen"
    return optax.chain(
        # ONE global clip over all parameter groups jointly, matching the HF
        # Trainer's clip_grad_norm_ semantics (not per-group clipping).
        optax.clip_by_global_norm(hp.max_grad_norm),
        optax.multi_transform(
            {"base": base, "centroid": centroid, "frozen": optax.set_to_zero()},
            labels),
    )


def encode_chunked(
    config: RepConcConfig,
    params,
    input_ids,
    attention_mask,
    chunk_size: int,
    train: bool,
    dropout_rng: Optional[jax.Array],
):
    """Gradient-cache-equivalent chunked encode: lax.map over fixed chunks
    with jax.checkpoint, so backward recomputes chunk activations instead of
    storing them (the reference's two-pass GradCache, finetune_repconc.py:26)."""
    B = input_ids.shape[0]
    if chunk_size <= 0 or B <= chunk_size:
        return repconc_model.encode_continuous(
            config, params, input_ids, attention_mask, train, dropout_rng)
    # a non-dividing chunk must NOT silently disable chunking (the unchunked
    # bert-base forward at global-batch scale is ~12 GB of activations —
    # HBM OOM); round down to the nearest divisor instead
    from repconc_tpu.quant.codebook import round_to_divisor

    chunk_size = round_to_divisor(B, chunk_size)
    nc = B // chunk_size
    ids_c = input_ids.reshape(nc, chunk_size, -1)
    mask_c = attention_mask.reshape(nc, chunk_size, -1)
    rngs = (jax.random.split(dropout_rng, nc)
            if dropout_rng is not None else jnp.zeros((nc, 2), jnp.uint32))

    @jax.checkpoint
    def enc(ids, mask, rng):
        r = rng if train and dropout_rng is not None else None
        return repconc_model.encode_continuous(config, params, ids, mask, train, r)

    out = jax.lax.map(lambda t: enc(*t), (ids_c, mask_c, rngs))
    return out.reshape(B, -1)


def make_train_step(config: RepConcConfig, hp: Stage1Hparams, tx):
    """Build the jitted global-batch train step.

    batch: dict of device arrays (global batch; shard over the mesh data axis
    via jit in_shardings). Returns (params, opt_state, metrics)."""
    mcc = config.similarity_metric == METRIC_CENTROID_COS

    def loss_fn(params, batch, dropout_rng):
        kq, kp, kn = jax.random.split(dropout_rng, 3)
        q_embeds = encode_chunked(config, params, batch["query_input_ids"],
                                  batch["query_attention_mask"],
                                  hp.cache_chunk_size, True, kq)
        pos_embeds = encode_chunked(config, params, batch["pos_input_ids"],
                                    batch["pos_attention_mask"],
                                    hp.cache_chunk_size, True, kp)
        has_negs = "neg_input_ids" in batch
        if has_negs:
            neg_embeds = encode_chunked(config, params, batch["neg_input_ids"],
                                        batch["neg_attention_mask"],
                                        hp.cache_chunk_size, True, kn)
            doc_embeds = jnp.concatenate([pos_embeds, neg_embeds], axis=0)
            doc_ids = jnp.concatenate([batch["pos_docids"], batch["neg_docids"]])
        else:
            doc_embeds = pos_embeds
            doc_ids = batch["pos_docids"]

        if hp.quantize:
            # constrained quantization over the (global) doc batch
            codes = codebook.encode(
                doc_embeds, params["centroids"],
                use_constraint=hp.use_constraint,
                sk_epsilon=config.sk_epsilon, sk_iters=config.sk_iters)
            quantized = codebook.decode(codes, params["centroids"])
            doc_rep = losses.straight_through(quantized, doc_embeds)
        else:
            # dense pre-training (stage 0): contrastive loss straight on the
            # continuous embeddings, no codebook in the graph
            quantized = doc_embeds
            doc_rep = doc_embeds

        neg_mask = losses.false_negative_mask(
            batch["qids"], doc_ids, batch["query_positives"]) | \
            losses.duplicate_negative_mask(batch["qids"], doc_ids)

        co_loss = losses.contrastive_loss(
            q_embeds, doc_rep, neg_mask, config.MCQ_M,
            metric_centroid_cos=mcc, temperature=hp.temperature,
            dynamic_topk_hard_negative=hp.dynamic_topk_hard_negative)
        m_loss = losses.mse_loss(quantized, doc_embeds)
        total = co_loss + hp.mse_loss_weight * m_loss
        return total, {"loss": total, "contrastive_loss": co_loss,
                       "mse_loss": m_loss}

    def train_step(params, opt_state, batch, rng):
        rng, dropout_rng = jax.random.split(rng)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params, batch, dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if mcc:
            # RepCONC_Norm_Centroid_Callback (finetune_repconc.py:216-222)
            params = dict(params,
                          centroids=codebook.normalize_centroids(params["centroids"]))
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics, rng

    return train_step


def make_quant_health_fn(config: RepConcConfig):
    """test_quantize + eval_balance diagnostics (finetune_repconc.py:580-613):
    reconstruction RMSE and code-balance stats with and without constraint.

    Balance is measured over ALL M subspaces (the reference's eval_balance
    loops subspaces, finetune_repconc.py:580-599): counts is the (M, K)
    per-subspace code histogram, imbalance |1 - count/expected| is averaged /
    maxed over the full (M, K) grid, and the per-subspace maximum is also
    returned so a pathology in any single subspace is visible in the logs.

    Takes the tokenized pos batch and encodes INSIDE the jit: an eager
    encode_continuous here would dispatch the whole transformer op-by-op
    through the remote-TPU tunnel at every logging step."""

    @jax.jit
    def fn(params, input_ids, attention_mask):
        doc_embeds = repconc_model.encode_continuous(
            config, params, input_ids, attention_mask)
        out = {}
        for prefix, use_constraint in (("wo_conc", False), ("w_conc", True)):
            codes = codebook.encode(doc_embeds, params["centroids"],
                                    use_constraint=use_constraint,
                                    sk_epsilon=config.sk_epsilon,
                                    sk_iters=config.sk_iters)
            rec = codebook.decode(codes, params["centroids"])
            rmse = jnp.mean(jnp.sqrt(jnp.sum((rec - doc_embeds) ** 2, -1)))
            # (B, M) codes -> (M, K) histogram in one one-hot sum
            counts = jnp.sum(jax.nn.one_hot(codes, config.MCQ_K), axis=0)
            expected = doc_embeds.shape[0] / config.MCQ_K
            imbalance = jnp.abs(1.0 - counts / expected)      # (M, K)
            out[f"{prefix}_rmse"] = rmse
            out[f"{prefix}_avg_imbalance"] = jnp.mean(imbalance)
            out[f"{prefix}_max_imbalance"] = jnp.max(imbalance)
            out[f"{prefix}_worst_subspace"] = jnp.argmax(
                jnp.max(imbalance, axis=1)).astype(jnp.float32)
        return out

    return fn


# ---------------------------------------------------------------------------
# Host training loop


def save_train_state(path: str, params, opt_state, step: int, best: float,
                     backend: str = "msgpack"):
    """Persist (params, optimizer state, step, best metric) for resume.

    backend="orbax" uses orbax-checkpoint (sharding-aware, async-capable —
    the right choice on multi-host meshes); "msgpack" is the dependency-free
    default. Reference analog: HF Trainer checkpoints (SURVEY.md §5)."""
    os.makedirs(path, exist_ok=True)
    blob = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
    }
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        target = os.path.join(os.path.abspath(path), "orbax")
        if os.path.exists(target):
            shutil.rmtree(target)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, blob)
    else:
        # atomic: a crash mid-save must never leave a truncated state where
        # the previous resumable checkpoint stood (an unattended retry loop
        # would then fail on EVERY attempt)
        target = os.path.join(path, "train_state.msgpack")
        with open(target + ".tmp", "wb") as f:
            f.write(serialization.to_bytes(blob))
        os.replace(target + ".tmp", target)
    meta_target = os.path.join(path, "trainer_meta.json")
    with open(meta_target + ".tmp", "w") as f:
        json.dump({"step": step, "best_metric": best, "backend": backend}, f)
    os.replace(meta_target + ".tmp", meta_target)


def load_train_state(path: str, params, opt_state):
    with open(os.path.join(path, "trainer_meta.json")) as f:
        meta = json.load(f)
    abstract = {"params": jax.tree.map(np.asarray, params),
                "opt_state": jax.tree.map(np.asarray, opt_state)}
    if meta.get("backend") == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            blob = ckptr.restore(os.path.join(os.path.abspath(path), "orbax"),
                                 abstract)
    else:
        with open(os.path.join(path, "train_state.msgpack"), "rb") as f:
            blob = serialization.from_bytes(abstract, f.read())
    return blob["params"], blob["opt_state"], meta["step"], meta["best_metric"]


def train(
    config: RepConcConfig,
    params,
    batches: Iterator[Dict[str, np.ndarray]],
    hp: Stage1Hparams,
    output_dir: str,
    tokenizer=None,
    valid_set: Optional[Tuple[Dict, Dict, Dict]] = None,
    mesh=None,
    metric_for_best: str = "MRR@10",
    log_fn=None,
) -> Dict[str, Any]:
    """Run stage-1 training. valid_set = (corpus, queries, qrels).

    Resumes automatically if output_dir holds a train_state checkpoint."""
    from repconc_tpu.eval.pipeline import (evaluate_dense_model,
                                           evaluate_repconc_model)

    tx = make_optimizer(hp, params)
    opt_state = tx.init(params)
    start_step, best = 0, -1.0
    ckpt_dir = os.path.join(output_dir, "checkpoint")
    if os.path.exists(os.path.join(ckpt_dir, "trainer_meta.json")):
        try:
            params, opt_state, start_step, best = load_train_state(
                ckpt_dir, params, opt_state)
            logger.info("resumed from step %d (best %.5f)", start_step, best)
        except Exception as e:  # corrupt state from a killed run: restart
            #                     from init rather than wedging every retry
            logger.warning("train-state checkpoint unreadable (%s) — "
                           "starting from step 0", e)

    step_fn = make_train_step(config, hp, tx)
    data = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        step_fn = jax.jit(step_fn,
                          in_shardings=(repl, repl, data, repl),
                          out_shardings=(repl, repl, repl, repl))
    else:
        step_fn = jax.jit(step_fn)
    health_fn = make_quant_health_fn(config)
    # Checkpoints/exports are written by process 0 only (on single-process
    # meshes every rank IS process 0, so this is a no-op there).
    is_main = jax.process_index() == 0

    rng = jax.random.key(hp.seed)
    log = log_fn or (lambda d: logger.info("%s", d))
    history = []
    step = start_step
    for batch in batches:
        if step >= hp.total_steps:
            break
        if data is not None:
            # Multi-host (DCN): each process loads the full global batch
            # (datasets are host-replicated, iteration is seed-deterministic)
            # and feeds only its contiguous block of rows to its own chips;
            # make_array_from_process_local_data assembles the global array.
            # Single-process meshes take the plain sharded device_put path.
            from repconc_tpu.core.distributed import (process_slice,
                                                      shard_host_batch)

            if jax.process_count() > 1:
                batch = {k: np.asarray(v)[process_slice(len(v))]
                         for k, v in batch.items()}
            dev_batch = shard_host_batch(data, batch)
        else:
            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, metrics, rng = step_fn(params, opt_state, dev_batch, rng)
        step += 1
        if hp.logging_steps and step % hp.logging_steps == 0:
            m = {k: float(v) for k, v in metrics.items()}
            if hp.quantize:
                m.update({k: round(float(v), 4)
                          for k, v in health_fn(
                              params, dev_batch["pos_input_ids"],
                              dev_batch["pos_attention_mask"]).items()})
            m["step"] = step
            history.append(m)
            log(m)
        if hp.eval_steps and valid_set is not None and step % hp.eval_steps == 0:
            # Checkpoint BEFORE the eval when a save is due at this step:
            # the eval's first run jit-compiles fresh programs, and on this
            # environment's remote-compile tunnel a compile request can
            # wedge indefinitely (CLAUDE.md) — the kill-and-retry must not
            # lose the training progress behind the eval boundary. Resume
            # redoes the eval; `best` is re-derived from its metric.
            if hp.save_steps and step % hp.save_steps == 0 and is_main:
                save_train_state(ckpt_dir, params, opt_state, step, best)
            corpus, queries, qrels = valid_set
            eval_fn = evaluate_repconc_model if hp.quantize else evaluate_dense_model
            eval_m = eval_fn(
                config, params, tokenizer, corpus, queries, qrels,
                max_seq_length=512, topk=10)
            log({"step": step, **{f"eval_{k}": v for k, v in eval_m.items()}})
            score = eval_m.get(metric_for_best, 0.0)
            if score > best:
                best = score
                if is_main:  # multi-host: one writer per shared artifact dir
                    repconc_model.save_pretrained(
                        os.path.join(output_dir, "best"), config, params)
                    if tokenizer is not None:
                        tokenizer.save_pretrained(
                            os.path.join(output_dir, "best"))
        if hp.save_steps and step % hp.save_steps == 0 and is_main:
            save_train_state(ckpt_dir, params, opt_state, step, best)

    if is_main:
        save_train_state(ckpt_dir, params, opt_state, step, best)
        repconc_model.save_pretrained(
            os.path.join(output_dir, "final"), config, params)
        if tokenizer is not None:
            tokenizer.save_pretrained(os.path.join(output_dir, "final"))
    return {"params": params, "step": step, "best_metric": best,
            "history": history}
