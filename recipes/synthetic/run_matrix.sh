#!/bin/bash
# Converged-encoder compression matrix (the round-3 quality study):
# OPQ-only / JPQ-only / RepCONC / RepCONC+JPQ at M=48 (64x), M=12 (256x)
# and M=4 (768x — the far end of the reference's claimed range,
# /root/reference/README.md:21), every variant starting from the SAME
# converged dense encoder produced by run_synth.sh's stage 0.
#
# Prerequisites: run_synth.sh has completed through stage 6 (shared dense
# embeds, valid sets, hardneg.json). Each M then gets its own warmup
# (stage 5) and the full trained matrix (stages 7-10 + siblings).
#
# The m4 low-mse leg reruns stages 7-10 with mse_loss_weight=1e-4 (the
# reference's own MS MARCO value, 7_run_conc_train.sh) in a tagged
# experiment dir: RESULTS.md's M=4 analysis shows the 0.01 anchor used at
# M=48/12 is miscast at 768x — it contributes ~5x the contrastive loss,
# cannot push RMSE below the 4-subspace floor, and consumes the clipped
# gradient budget.
#
# Usage: bash recipes/synthetic/run_matrix.sh <workspace>
set -eu
WS=${1:?workspace (run_synth.sh output)}
HERE=$(cd "$(dirname "$0")" && pwd)
HF_DIR="${WS}/experiments/synth/dense_pretrain/export_hf"

make_env() {  # make_env <out.env> <M> [extra lines...]
  local OUT=$1 MM=$2; shift 2
  cat > "${OUT}" <<EOF
FAMILY=synth-bertbase
HF_MODEL_DIR=${HF_DIR}
POOLING=mean
METRIC_DENSE=METRIC_IP
M=${MM}
DATA_DIR=${WS}/data
OUT_ROOT=${WS}/experiments/synth
GLOBAL_BATCH=${GLOBAL_BATCH:-256}
CACHE_CHUNK=${CACHE_CHUNK:-128}
CONC_STEPS=${CONC_STEPS:-800}
JPQ_STEPS=${JPQ_STEPS:-800}
JPQ_BATCH=${JPQ_BATCH:-128}
EVAL_STEPS=100
MAX_DOC_LEN_EVAL=128
NLIST=1024
NPROBE=32
MAX_POSITIVES=160
CONC_LR=2e-6
CONC_CENTROID_LR=1e-3
EOF
  printf '%s\n' "$@" >> "${OUT}"
}

run_stages() {  # run_stages <env> <stage...>
  local ENVF=$1; shift
  for STAGE in "$@"; do
    T0=$(date +%s)
    bash "${HERE}/../run_pipeline.sh" "${ENVF}" "${STAGE}"
    echo -e "$(basename "${ENVF}" .env)/${STAGE}\t$(( $(date +%s) - T0 ))s" \
      | tee -a "${WS}/stage_times_matrix.tsv"
  done
}

# Stabilized-config matrices (RESULTS.md: reference LRs norm-inflate on a
# saturated task; lr 2e-6 / centroid 1e-3 / mse 0.01 is the stable point
# at M=48/12).
for MM in 48 12 4; do
  make_env "${WS}/matrix_m${MM}.env" "${MM}" "MSE_WEIGHT=0.01"
  run_stages "${WS}/matrix_m${MM}.env" 5 7 8 9 10 opq-eval jpq-train jpq-eval
done

# Low-mse variants (mse_loss_weight=1e-4, the reference's own MS MARCO
# value): each shares its base M's warmup (stage 7's only tagged input);
# opq/jpq-only siblings are identical to the base and are not rerun.
# m4: RESULTS.md shows the 0.01 anchor consumes the clipped gradient budget
# at 768x. m12: the 0.01 anchor left RepCONC MRR@10 in a statistical tie
# with OPQ at 256x — the reference's value is the natural follow-up.
for MM in 4 12; do
  make_env "${WS}/matrix_m${MM}_lowmse.env" "${MM}" \
    "MSE_WEIGHT=1e-4" "EXP_TAG=-lowmse"
  mkdir -p "${WS}/experiments/synth/m${MM}-lowmse"
  ln -sfn "../m${MM}/warmup_model" \
    "${WS}/experiments/synth/m${MM}-lowmse/warmup_model"
  run_stages "${WS}/matrix_m${MM}_lowmse.env" 7 8 9 10
done

echo "=== compression matrix metrics ==="
python - <<EOF
import json, os
root = "${WS}/experiments/synth"
for mm in ("m48", "m12", "m4", "m4-lowmse", "m12-lowmse"):
    for name in ("opq_index/dev", "jpq_only_index/dev", "conc_index/dev",
                 "jpq_index/dev"):
        p = os.path.join(root, mm, name, "metric.json")
        if os.path.exists(p):
            m = json.load(open(p))
            print(f"{mm}/{name}: MRR@10={m['mrr']['MRR@10']} "
                  f"NDCG@10={m['ndcg']['NDCG@10']} "
                  f"R@100={m['recall']['Recall@100']}")
EOF
