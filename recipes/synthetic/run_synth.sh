#!/bin/bash
# Bert-base-scale offline rehearsal: 200k-doc synthetic corpus, real 12-layer
# encoder, IVF eval path, all three recipe variants (RepCONC / OPQ-only /
# JPQ-only). Per-stage wall-clock is recorded to ${WS}/stage_times.tsv.
#
# Usage: bash recipes/synthetic/run_synth.sh [workspace] [n_docs]
set -eu
WS=${1:-./synth_workspace}
NDOCS=${2:-200000}
HERE=$(cd "$(dirname "$0")" && pwd)

if [ ! -f "${WS}/data/corpus.tsv" ]; then
  python "${HERE}/make_synth_data.py" --out_dir "${WS}" --n_docs "${NDOCS}"
fi

cat > "${WS}/synth.env" <<EOF
FAMILY=synth-bertbase
HF_MODEL_DIR=${WS}/models/synth-bert-base
POOLING=mean
METRIC_DENSE=METRIC_IP
M=48
DATA_DIR=${WS}/data
OUT_ROOT=${WS}/experiments/synth
GLOBAL_BATCH=${GLOBAL_BATCH:-256}
CACHE_CHUNK=${CACHE_CHUNK:-128}
CONC_STEPS=${CONC_STEPS:-200}
JPQ_STEPS=${JPQ_STEPS:-300}
JPQ_BATCH=${JPQ_BATCH:-128}
EVAL_STEPS=${EVAL_STEPS:-50}
MAX_DOC_LEN_EVAL=${MAX_DOC_LEN_EVAL:-128}
IVF=1
NLIST=${NLIST:-1024}
NPROBE=${NPROBE:-32}
EOF

TIMES="${WS}/stage_times.tsv"
: > "${TIMES}"
for STAGE in 2 3 4 5 6 7 8 9 10 opq-eval jpq-train jpq-eval; do
  T0=$(date +%s)
  bash "${HERE}/../run_pipeline.sh" "${WS}/synth.env" "${STAGE}"
  echo -e "${STAGE}\t$(( $(date +%s) - T0 ))s" | tee -a "${TIMES}"
done

echo "=== synthetic bert-base rehearsal metrics ==="
python - <<EOF
import json, os
root = "${WS}/experiments/synth"
for name in ("dense/dev", "m48/conc_index/dev", "m48/jpq_index/dev",
             "m48/opq_index/dev", "m48/jpq_only_index/dev"):
    p = os.path.join(root, name, "metric.json")
    if os.path.exists(p):
        m = json.load(open(p))
        print(f"{name}: MRR@10={m['mrr']['MRR@10']} "
              f"R@100={m['recall']['Recall@100']}")
EOF
