"""Stage-2 (JPQ-style) training: query encoder + centroids vs frozen doc codes.

TPU-native rebuild of the reference's JPQ/JPQFinetuner
(models/jpq/finetune_jpq.py:142-374). The reference keeps THREE copies of the
centroids in sync every optimizer step (model tensor -> faiss CPU index ->
faiss GPU re-clone, finetune_jpq.py:208-214,246-252) because search lives in
faiss. Here the index IS (codes, centroids): retrieval of dynamic hard
negatives runs inside the jitted train step against the same centroid array
the optimizer updates — the entire synchronization machinery vanishes.

Per step (reference finetune_jpq.py:164-243):
  1. encode queries (continuous, trainable);
  2. ADC top-k over ALL doc codes with the current centroids (detached
     queries) -> dynamic hard negatives;
  3. reconstruct negatives and the sampled positive via decode(codes) so
     gradients flow into the centroids;
  4. CE ranking loss over [positive; top-k negatives], label 0.

Deviation from the reference, on purpose: the reference computes a
false-negative mask for retrieved positives but never applies it in
compute_loss (finetune_jpq.py:191,231-243 — the `neg_masks` argument is
unused). We apply the mask; retrieved true positives are suppressed.
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from repconc_tpu.core.config import METRIC_CENTROID_COS, RepConcConfig
from repconc_tpu.index.adc import build_lut, score_codes
from repconc_tpu.models import repconc_model
from repconc_tpu.quant import codebook
from repconc_tpu.train import stage1

logger = logging.getLogger(__name__)


@dataclass
class Stage2Hparams:
    """Mirrors JPQFinetuneArguments (finetune_jpq.py:40-49)."""

    learning_rate: float = 5e-6
    centroid_learning_rate: float = 2e-4
    weight_decay: float = 0.01
    warmup_steps: int = 0
    total_steps: int = 10000
    dynamic_topk_negative: int = 200
    temperature: float = 1.0
    max_grad_norm: float = 1.0
    use_pallas_search: Optional[bool] = None  # None = auto (TPU and N>=100k)
    seed: int = 2023
    logging_steps: int = 20
    eval_steps: int = 0
    save_steps: int = 0

    def as_stage1(self) -> stage1.Stage1Hparams:
        return stage1.Stage1Hparams(
            learning_rate=self.learning_rate,
            centroid_learning_rate=self.centroid_learning_rate,
            weight_decay=self.weight_decay,
            warmup_steps=self.warmup_steps,
            total_steps=self.total_steps,
            max_grad_norm=self.max_grad_norm,
        )


def make_train_step(config: RepConcConfig, hp: Stage2Hparams, tx, codes,
                    mesh=None):
    """codes: (N, M) frozen doc codes. Returns (train_step, codes_dev):
    train_step takes the (padded/cast) device codes as its FIFTH argument —
    codes must NOT be closure-captured, or they become a compile-time
    constant embedded in the jit payload (0.4-1.7 GiB at MS MARCO scale;
    through this environment's remote-compile tunnel that is a ~45-min
    upload ending in HTTP 413).

    With `mesh`, the step is built for a dp-sharded query batch (codes and
    params replicated; XLA partitions the in-step retrieval einsums over the
    batch shards). The Pallas search path is disabled under a mesh — a
    pallas_call is an opaque custom call GSPMD cannot partition; the XLA
    scoring path shards cleanly."""
    N = codes.shape[0]
    mcc = config.similarity_metric == METRIC_CENTROID_COS
    k = hp.dynamic_topk_negative

    use_pallas = hp.use_pallas_search
    if use_pallas is None:
        use_pallas = (mesh is None and
                      jax.devices()[0].platform != "cpu" and N >= 100_000)
    if mesh is not None and use_pallas:
        logger.warning("use_pallas_search forced off: mesh-sharded stage-2 "
                       "uses the GSPMD-partitionable XLA search path")
        use_pallas = False
    if use_pallas:
        from repconc_tpu.index import pallas_adc

        def _round_up(n, m):
            return ((n + m - 1) // m) * m

        chunk = min(1 << 17, _round_up(N, pallas_adc.DOC_TILE))
        npad = _round_up(N, chunk)
        padded = np.zeros((npad, codes.shape[1]), dtype=np.uint8)
        padded[:N] = np.asarray(codes)
        codes_dev = jnp.asarray(padded)
        gm = pallas_adc._group_size(codes.shape[1], config.MCQ_K)
    else:
        # uint8 on device: score_codes/decode widen per-use, so the resident
        # copy stays 1 byte/code — at 8.8M docs M=48 that is 0.4 GB instead
        # of 1.7 GB (and 4x less replication traffic under a mesh)
        codes_dev = jnp.asarray(np.asarray(codes).astype(np.uint8))

    def retrieve(q_detached, centroids, codes):
        """Top-k dynamic hard negatives; the whole search is gradient-free
        (the reference searches a DETACHED faiss copy, finetune_jpq.py:176)."""
        centroids = jax.lax.stop_gradient(centroids)
        if use_pallas:
            lut = build_lut(q_detached, centroids)
            lut_perm = pallas_adc.permute_lut(lut, gm).astype(jnp.bfloat16)
            B = lut_perm.shape[0]
            qpad = (-B) % pallas_adc.QUERY_TILE
            if qpad:
                lut_perm = jnp.pad(lut_perm, ((0, qpad), (0, 0)))
            _, pids = pallas_adc._search_device(
                lut_perm, codes, N, k, config.MCQ_K, chunk, False)
            return pids[:B]
        lut = build_lut(q_detached, centroids)
        all_scores = score_codes(lut, codes)  # (B, N)
        # exact PartialReduce top-k: lax.top_k's full sort at k~200-1000
        # can wedge the remote compiler for 10+ min (CLAUDE.md)
        return jax.lax.approx_max_k(
            all_scores, k, recall_target=1.0)[1].astype(jnp.int32)

    def loss_fn(params, batch, dropout_rng, codes):
        q_embeds = repconc_model.encode_continuous(
            config, params, batch["query_input_ids"],
            batch["query_attention_mask"], train=True, dropout_rng=dropout_rng)
        centroids = params["centroids"]

        # dynamic hard negatives: ADC search against the live centroids
        # (reference does a faiss GPU search per step, finetune_jpq.py:176)
        neg_pids = retrieve(jax.lax.stop_gradient(q_embeds), centroids, codes)

        B = q_embeds.shape[0]
        neg_codes = jnp.take(codes, neg_pids.reshape(-1), axis=0)  # (B*k, M)
        neg_embeds = codebook.decode(neg_codes, centroids).reshape(B, k, -1)
        pos_codes = jnp.take(codes, batch["pos_docids"], axis=0)
        pos_embeds = codebook.decode(pos_codes, centroids)  # (B, D)

        # Unlike stage-1 (finetune_repconc.py:414-417), the reference's JPQ
        # loss divides by temperature ONLY — no /MCQ_M for CENTROID_COS
        # families (finetune_jpq.py:179-188) — so published stage-2
        # hyperparameters transfer unchanged.
        neg_scores = jnp.einsum("bd,bkd->bk", q_embeds, neg_embeds,
                                preferred_element_type=jnp.float32)
        neg_scores = neg_scores / hp.temperature
        pos_scores = jnp.sum(q_embeds * pos_embeds, axis=-1, keepdims=True)
        pos_scores = pos_scores / hp.temperature

        # mask retrieved docs that are judged positives of the query
        positives = batch["query_positives"]  # (B, P), -1 padded
        is_pos = jnp.any(
            (neg_pids[:, :, None] == positives[:, None, :]) &
            (positives[:, None, :] >= 0), axis=-1)
        neg_scores = neg_scores - 10000.0 * is_pos.astype(neg_scores.dtype)

        logits = jnp.concatenate([pos_scores, neg_scores], axis=1)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        loss = jnp.mean(logz - logits[:, 0])
        return loss, {"loss": loss}

    def train_step(params, opt_state, batch, rng, codes):
        rng, dropout_rng = jax.random.split(rng)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, batch, dropout_rng, codes)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if mcc:
            params = dict(params,
                          centroids=codebook.normalize_centroids(params["centroids"]))
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics, rng

    return train_step, codes_dev


def train(
    config: RepConcConfig,
    params,
    codes: np.ndarray,
    batches: Iterator[Dict[str, np.ndarray]],
    hp: Stage2Hparams,
    output_dir: str,
    tokenizer=None,
    valid_set: Optional[Tuple[np.ndarray, Dict, Dict]] = None,
    metric_for_best: str = "MRR@10",
    log_fn=None,
    mesh=None,
) -> Dict[str, Any]:
    """Stage-2 loop. valid_set = (corpus_ids, queries, qrels): evaluation
    re-encodes queries and searches the FROZEN codes with live centroids
    (reference: finetune_jpq.py:274-319). With `mesh`, the query batch is
    sharded over the mesh's dp axis (the reference's stage-2 is single-GPU,
    run_train_jpq.py:95 — this is a capability the reference lacks)."""
    from repconc_tpu.eval.encode import encode_queries
    from repconc_tpu.eval.pipeline import run_from_topk
    from repconc_tpu.eval.trec import evaluate_run
    from repconc_tpu.index.adc import batch_adc_search

    tx = stage1.make_optimizer(hp.as_stage1(), params)
    opt_state = tx.init(params)
    start_step, best = 0, -1.0
    ckpt_dir = os.path.join(output_dir, "checkpoint")
    if os.path.exists(os.path.join(ckpt_dir, "trainer_meta.json")):
        try:
            params, opt_state, start_step, best = stage1.load_train_state(
                ckpt_dir, params, opt_state)
            logger.info("resumed from step %d (best %.5f)", start_step, best)
        except Exception as e:  # corrupt state from a killed run: restart
            logger.warning("train-state checkpoint unreadable (%s) — "
                           "starting from step 0", e)

    step_fn, codes_dev = make_train_step(config, hp, tx, codes, mesh=mesh)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        step_fn = jax.jit(step_fn,
                          in_shardings=(repl, repl, data, repl, repl),
                          out_shardings=(repl, repl, repl, repl))
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        codes_dev = jax.device_put(codes_dev, repl)
    else:
        step_fn = jax.jit(step_fn)
    rng = jax.random.key(hp.seed)
    log = log_fn or (lambda d: logger.info("%s", d))
    history = []
    step = start_step

    def eval_now(params):
        cids, queries, qrels = valid_set
        q_embeds, query_ids = encode_queries(
            queries, config, params, tokenizer, 64, batch_size=256)
        s, ids = batch_adc_search(query_ids, q_embeds, cids, codes,
                                  np.asarray(params["centroids"]), topk=10)
        run = run_from_topk(query_ids, s, ids)
        m = evaluate_run(qrels, run, k_values=(10,), mrr_k_values=(10,))
        flat = {}
        for cat, d in m.items():
            if cat != "perquery":
                flat.update(d)
        return flat

    for batch in batches:
        if step >= hp.total_steps:
            break
        dev_batch = {kk: jnp.asarray(v) for kk, v in batch.items()}
        params, opt_state, metrics, rng = step_fn(params, opt_state,
                                                  dev_batch, rng, codes_dev)
        step += 1
        if hp.logging_steps and step % hp.logging_steps == 0:
            m = {kk: float(v) for kk, v in metrics.items()}
            m["step"] = step
            history.append(m)
            log(m)
        if hp.eval_steps and valid_set is not None and step % hp.eval_steps == 0:
            eval_m = eval_now(params)
            log({"step": step, **{f"eval_{kk}": v for kk, v in eval_m.items()}})
            score = eval_m.get(metric_for_best, 0.0)
            if score > best:
                best = score
                repconc_model.save_pretrained(
                    os.path.join(output_dir, "best"), config, params)
                if tokenizer is not None:
                    tokenizer.save_pretrained(os.path.join(output_dir, "best"))
        if hp.save_steps and step % hp.save_steps == 0:
            stage1.save_train_state(ckpt_dir, params, opt_state, step, best)

    stage1.save_train_state(ckpt_dir, params, opt_state, step, best)
    repconc_model.save_pretrained(os.path.join(output_dir, "final"), config, params)
    if tokenizer is not None:
        tokenizer.save_pretrained(os.path.join(output_dir, "final"))
    return {"params": params, "step": step, "best_metric": best,
            "history": history}
