#!/bin/bash
# Fully-offline end-to-end pipeline smoke run (stages 2-10) on toy data.
# Usage: bash recipes/toy/run_toy.sh [workspace_dir]
set -eu
WS=${1:-./toy_workspace}
HERE=$(cd "$(dirname "$0")" && pwd)

python "${HERE}/make_toy_data.py" --out_dir "${WS}"

export FAMILY=toy
cat > "${WS}/toy.env" <<EOF
FAMILY=toy
HF_MODEL_DIR=${WS}/models/toy-bert
POOLING=mean
METRIC_DENSE=METRIC_COS
M=8
DATA_DIR=${WS}/data
OUT_ROOT=${WS}/experiments/toy
GLOBAL_BATCH=32
CACHE_CHUNK=-1
CONC_STEPS=30
JPQ_STEPS=20
MAX_DOC_LEN_EVAL=32
EOF
bash "${HERE}/../run_pipeline.sh" "${WS}/toy.env" 2 3 4 5 6 7 8 9 10

echo "=== toy pipeline metrics ==="
python - <<EOF
import json
for name in ("dense/dev", "m8/conc_index/dev", "m8/jpq_index/dev"):
    m = json.load(open("${WS}/experiments/toy/" + name + "/metric.json"))
    print(f"{name}: MRR@10={m['mrr']['MRR@10']} R@100={m['recall']['Recall@100']}")
EOF
