#!/bin/bash
# Zero-shot BEIR-format evaluation of a trained RepCONC model.
#
# TPU-native counterpart of the reference's
# examples/evaluate/repconc_eval_beir.sh: where the reference launches one
# torch.distributed process per GPU, here multi-device is one SPMD program —
# pass DATA_PARALLEL=1 to dp-shard encoding and shard the index over the
# mesh (no launcher, no master port).
#
# Usage:
#   bash recipes/beir_eval.sh <dataset_dir> <output_dir> <doc_encoder> [query_encoder]
# <dataset_dir> holds corpus.jsonl, queries.jsonl, qrels/test.tsv (standard
# BEIR layout). If no query encoder is given the doc encoder is used for both.
set -eu
DATASET_DIR=$1
OUTPUT_DIR=$2
DOC_ENCODER=$3
QUERY_ENCODER=${4:-}

mkdir -p "${OUTPUT_DIR}"
if [ -n "${QUERY_ENCODER}" ]; then
  MODEL_ARGS=(--doc_encoder_path "${DOC_ENCODER}"
              --query_encoder_path "${QUERY_ENCODER}")
else
  MODEL_ARGS=(--model_name_or_path "${DOC_ENCODER}")
fi

python -m repconc_tpu.cli.run_repconc_eval \
    "${MODEL_ARGS[@]}" \
    --corpus_path "${DATASET_DIR}/corpus.jsonl" \
    --query_path "${DATASET_DIR}/queries.jsonl" \
    --qrel_path "${DATASET_DIR}/qrels/test.tsv" \
    --out_corpus_dir "${OUTPUT_DIR}" \
    --out_query_dir "${OUTPUT_DIR}/test" \
    --data_format beir \
    --per_device_eval_batch_size ${EVAL_BATCH:-64} \
    --max_seq_length ${MAX_SEQ_LEN:-512} \
    --topk ${TOPK:-1000} \
    ${DATA_PARALLEL:+--data_parallel} \
    ${IVF:+--index_type ivf --nlist ${NLIST:-4096} --nprobe ${NPROBE:-64}}
