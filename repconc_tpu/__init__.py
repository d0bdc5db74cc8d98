"""repconc_tpu — a TPU-native joint encoder + product-quantization retrieval framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of RepCONC
(jingtaozhan/RepCONC, WSDM'22): train dual-encoder retrieval models jointly
with a product-quantized index under a uniform-assignment (Sinkhorn/optimal
transport) constraint, build compressed indexes, and serve approximate
nearest-neighbor queries — all as jitted mesh programs on TPU.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  core/    mesh, config, checkpointing, logging
  models/  flax dual-encoder zoo (BERT/RoBERTa/DistilBERT) + adapter protocol
  quant/   PQ codebooks, rotation, Sinkhorn-constrained assignment, decode
  index/   k-means, OPQ, flat / ADC / IVF-PQ search (XLA + Pallas kernels)
  train/   stage-1 (RepCONC) and stage-2 (JPQ) trainers, data pipeline
  eval/    trec_eval-parity metrics, TREC run IO, batch encoding
  cli/     pipeline entry points (customize/warmup/train/eval/...)
"""

__version__ = "0.1.0"
