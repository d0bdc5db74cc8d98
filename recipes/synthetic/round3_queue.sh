#!/bin/bash
# Round-3 chip-resume queue: every on-chip run that was blocked by the
# axon-tunnel outage, ordered so the most valuable deliverables land first
# and restartable step-by-step (each step leaves a .done marker; rerunning
# the script skips finished steps, and the pipeline stages themselves are
# skip-if-exists cached).
#
#   1. int8-vs-bf16 LUT A/B at MS MARCO scale (10.2M padded docs, no model
#      needed) — VERDICT round-2 ask #10.
#   2. 200k synthetic data + stage-0 dense pre-training to convergence +
#      shared stages 2-6 (dense eval, valid set, m48 warmup, hard negs).
#   3. Short (200-step) m48 RepCONC leg in a tagged dir — just enough to
#      produce a real trained model for:
#   4. the ONE-COMMAND 8.8M end-to-end rehearsal (encode -> IVF build ->
#      Pallas serve, per-phase timings) — VERDICT round-2 ask #4.
#   5. m4 + m12 low-mse matrix legs (mse_loss_weight=1e-4, the reference's
#      own MS MARCO value) with their OPQ anchors — the sharpest remaining
#      shot at the reference's RepCONC>JPQ>OPQ headline ordering
#      (RESULTS.md "M=4 training dynamics").
#   6. JPQ-only siblings + base (mse=0.01) legs, time permitting, so the
#      whole fresh-encoder table is self-consistent.
#
# Usage: bash recipes/synthetic/round3_queue.sh [workspace]
set -u
WS=${1:-/root/ws3}
HERE=$(cd "$(dirname "$0")" && pwd)
PIPE="${HERE}/../run_pipeline.sh"
REPO=$(cd "${HERE}/../.." && pwd)
mkdir -p "${WS}"
QLOG="${WS}/queue_log.txt"
note() { echo "[$(date '+%m-%d %H:%M:%S')] $*" | tee -a "${QLOG}"; }

step() {  # step <name> <cmd...> -> 0 ok/skipped, 1 failed
  local NAME=$1; shift
  if [ -f "${WS}/.done_${NAME}" ]; then note "skip ${NAME}"; return 0; fi
  note "start ${NAME}"
  local T0=$(date +%s)
  if "$@" >> "${WS}/log_${NAME}.txt" 2>&1; then
    touch "${WS}/.done_${NAME}"
    note "done ${NAME} ($(( $(date +%s) - T0 ))s)"
  else
    note "FAIL ${NAME} ($(( $(date +%s) - T0 ))s) — see log_${NAME}.txt"
    return 1
  fi
}

HF_DIR="${WS}/experiments/synth/dense_pretrain/export_hf"
make_env() {  # make_env <out.env> <M> [extra lines...]  (= run_matrix.sh)
  local OUT=$1 MM=$2; shift 2
  cat > "${OUT}" <<EOF
FAMILY=synth-bertbase
HF_MODEL_DIR=${HF_DIR}
POOLING=mean
METRIC_DENSE=METRIC_IP
M=${MM}
DATA_DIR=${WS}/data
OUT_ROOT=${WS}/experiments/synth
GLOBAL_BATCH=256
CACHE_CHUNK=128
CONC_STEPS=800
JPQ_STEPS=800
JPQ_BATCH=128
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

cd "${REPO}"

# ---- 1. LUT dtype A/B at MS MARCO scale (synthetic index, no model) ----
step int8_ab python recipes/bench_ivf_scale.py --lut_dtype both

# ---- 2. data + converged dense encoder + shared stages ----
if [ ! -f "${WS}/data/corpus.tsv" ]; then
  step data200k python "${HERE}/make_synth_data.py" \
    --out_dir "${WS}" --n_docs 200000 || exit 1
fi
cat > "${WS}/stage0.env" <<EOF
FAMILY=synth-bertbase
HF_MODEL_DIR=${WS}/models/synth-bert-base
POOLING=mean
METRIC_DENSE=METRIC_IP
DATA_DIR=${WS}/data
OUT_ROOT=${WS}/experiments/synth
DENSE_STEPS=2000
DENSE_BATCH=256
DENSE_LR=1e-4
DENSE_EVAL_STEPS=200
CACHE_CHUNK=128
EOF
step stage0 bash "${PIPE}" "${WS}/stage0.env" 0 || exit 1

make_env "${WS}/m48.env" 48 "MSE_WEIGHT=0.01"
step shared bash "${PIPE}" "${WS}/m48.env" 2 3 4 5 6 || exit 1

# ---- 3. short m48 leg -> model for the 8.8M e2e ----
make_env "${WS}/m48_e2e.env" 48 "MSE_WEIGHT=0.01" "EXP_TAG=-e2e" \
  "CONC_STEPS=200"
mkdir -p "${WS}/experiments/synth/m48-e2e"
ln -sfn "../m48/warmup_model" "${WS}/experiments/synth/m48-e2e/warmup_model"
step m48_short_conc bash "${PIPE}" "${WS}/m48_e2e.env" 7

# ---- 4. ONE-COMMAND 8.8M end-to-end (VERDICT ask #4) ----
if [ -f "${WS}/.done_m48_short_conc" ]; then
  E2E_MODEL="${WS}/experiments/synth/m48-e2e/conc/best"
  [ -d "${E2E_MODEL}" ] || E2E_MODEL="${WS}/experiments/synth/m48-e2e/conc/final"
  step e2e_8m8 bash "${REPO}/recipes/msmarco_scale_e2e.sh" \
    /root/ws8m "${E2E_MODEL}" 8800000
fi

# ---- 5. low-mse matrix legs (+ their OPQ anchors) ----
for MM in 4 12; do
  make_env "${WS}/m${MM}.env" "${MM}" "MSE_WEIGHT=0.01"
  step "m${MM}_warmup" bash "${PIPE}" "${WS}/m${MM}.env" 5 || continue
  step "m${MM}_opq_eval" bash "${PIPE}" "${WS}/m${MM}.env" opq-eval
  # LOWMSE_CONC_STEPS trims the stage-7 budget under wall-clock pressure
  # (last assignment wins when run_pipeline sources the env)
  make_env "${WS}/m${MM}_lowmse.env" "${MM}" "MSE_WEIGHT=1e-4" \
    "EXP_TAG=-lowmse" "CONC_STEPS=${LOWMSE_CONC_STEPS:-800}"
  mkdir -p "${WS}/experiments/synth/m${MM}-lowmse"
  ln -sfn "../m${MM}/warmup_model" \
    "${WS}/experiments/synth/m${MM}-lowmse/warmup_model"
  step "m${MM}_lowmse" bash "${PIPE}" "${WS}/m${MM}_lowmse.env" 7 8 9 10
done

# ---- 6. JPQ-only siblings + base legs (fresh-run comparability) ----
for MM in 4 12; do
  step "m${MM}_jpq_only" bash "${PIPE}" "${WS}/m${MM}.env" jpq-train jpq-eval
done
for MM in 4 12 48; do
  step "m${MM}_base" bash "${PIPE}" "${WS}/m${MM}.env" 7 8 9 10
done
step m48_siblings bash "${PIPE}" "${WS}/m48.env" opq-eval jpq-train jpq-eval

note "queue complete"
python - <<EOF
import json, os
root = "${WS}/experiments/synth"
for mm in ("m48", "m12", "m4", "m4-lowmse", "m12-lowmse", "m48-e2e"):
    for name in ("opq_index/dev", "jpq_only_index/dev", "conc_index/dev",
                 "jpq_index/dev"):
        p = os.path.join(root, mm, name, "metric.json")
        if os.path.exists(p):
            m = json.load(open(p))
            print(f"{mm}/{name}: MRR@10={m['mrr']['MRR@10']:.4f} "
                  f"NDCG@10={m['ndcg']['NDCG@10']:.4f} "
                  f"R@100={m['recall']['Recall@100']:.4f}")
EOF
