#!/bin/bash
# Round-4 held-out-encoder matrix (VERDICT round-3 ask #2): give stage-1
# doc-side training real headroom so the reference's headline ordering —
# RepCONC > JPQ-only > OPQ on MRR@10 (examples/sentence-bert/README.md:
# 11-17) — can actually appear.
#
# Construction: stage 0 converges on queries from HALF the subtopics
# (data_stage0); the whole quantized pipeline trains AND evaluates on the
# other half (data_task). The doc encoder is then non-optimal for the task
# (the MS MARCO situation) and only variants that train the DOC side
# (RepCONC stages 7-10) can close that gap — JPQ-only trains the query
# encoder against frozen warmup codes.
#
# Legs at M=12 (the 256x point where round 3 showed compression binds):
#   opq      — OPQ warmup only (anchor)
#   jpq_only — stage-2 JPQ on warmup codes (query-side only)
#   conc     — RepCONC stage-1 (+ eval), then stage-2 on its codes
#
# Restartable: .done markers per step; pipeline stages skip-if-exists.
# Usage: bash recipes/synthetic/round4_heldout.sh <src_ws=/root/ws3> <ws=/root/ws4>
set -u
SRC=${1:-/root/ws3}
WS=${2:-/root/ws4}
HERE=$(cd "$(dirname "$0")" && pwd)
PIPE="${HERE}/../run_pipeline.sh"
REPO=$(cd "${HERE}/../.." && pwd)
mkdir -p "${WS}"
QLOG="${WS}/queue_log.txt"
note() { echo "[$(date '+%m-%d %H:%M:%S')] $*" | tee -a "${QLOG}"; }
step() {
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

cd "${REPO}"
PERSIST="${HERE}/../persist_artifacts.sh"

step split python "${HERE}/split_queries_heldout.py" "${SRC}/data" "${WS}" \
  || exit 1

HF_DIR="${WS}/experiments/synth/dense_pretrain/export_hf"

# Reset-proofing (the host was wiped mid-round twice): expensive trained
# artifacts are committed to the repo by persist_artifacts.sh and restored
# here, so a reset costs a skip-cache rebuild instead of chip hours.
if [ ! -f "${WS}/.done_stage0" ] \
    && bash "${PERSIST}" restore r5h_export_hf "${HF_DIR}"; then
  touch "${WS}/.done_stage0"
  note "stage0 restored from repo artifact"
fi
CONC_BEST="${WS}/experiments/synth/m12/conc/best"
if [ ! -f "${WS}/.done_conc7" ] \
    && bash "${PERSIST}" restore r5h_m12_conc_best "${CONC_BEST}"; then
  # best-by-valid-MRR checkpoint survived a reset: eval it rather than
  # retrain (the documented wall-clock-cutoff path below).
  touch "${WS}/.done_conc7"
  note "conc7 best checkpoint restored from repo artifact — skipping retrain"
fi

persist_metrics() {
  mkdir -p "${REPO}/docs/heldout_r5"
  python "${HERE}/print_heldout_table.py" "${WS}" \
    > "${REPO}/docs/heldout_r5/table.md" 2>/dev/null || true
  for leg in dense/dev m12/opq_index/dev m12/jpq_only_index/dev \
             m12/conc_index/dev m12/jpq_index/dev; do
    mp="${WS}/experiments/synth/${leg}/metric.json"
    [ -f "${mp}" ] && cp "${mp}" \
      "${REPO}/docs/heldout_r5/$(echo "${leg}" | tr / _).json"
  done
  cd "${REPO}"
  git add docs/heldout_r5 > /dev/null 2>&1
  git diff --cached --quiet \
    || git commit -q -m "heldout r5: persist measured metrics (auto)"
  cd - > /dev/null
}
cat > "${WS}/stage0.env" <<EOF
FAMILY=synth-heldout
HF_MODEL_DIR=${SRC}/models/synth-bert-base
POOLING=mean
METRIC_DENSE=METRIC_IP
DATA_DIR=${WS}/data_stage0
OUT_ROOT=${WS}/experiments/synth
DENSE_STEPS=2000
DENSE_BATCH=256
DENSE_LR=1e-4
DENSE_EVAL_STEPS=200
CACHE_CHUNK=128
EOF
step stage0 bash "${PIPE}" "${WS}/stage0.env" 0 || exit 1
bash "${PERSIST}" save r5h_export_hf "${HF_DIR}"

make_env() {  # make_env <out.env> [extra lines...]
  local OUT=$1; shift
  cat > "${OUT}" <<EOF
FAMILY=synth-heldout
HF_MODEL_DIR=${HF_DIR}
POOLING=mean
METRIC_DENSE=METRIC_IP
M=12
DATA_DIR=${WS}/data_task
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
MSE_WEIGHT=0.01
EOF
  printf '%s\n' "$@" >> "${OUT}"
}
# HELDOUT_CONC_STEPS trims the stage-7 budget under wall-clock pressure
make_env "${WS}/m12.env" "CONC_STEPS=${HELDOUT_CONC_STEPS:-800}"

# task-side dense baseline + shared artifacts (the dense eval now measures
# the held-out gap itself: expect well below the ws3 0.967 MRR@10)
step shared bash "${PIPE}" "${WS}/m12.env" 2 3 4 5 6 || exit 1
persist_metrics
step opq_eval bash "${PIPE}" "${WS}/m12.env" opq-eval
persist_metrics
step jpq_only bash "${PIPE}" "${WS}/m12.env" jpq-train jpq-eval
persist_metrics
# conc split per stage so a wall-clock cutoff can stop stage 7 mid-run
# (best-by-MRR checkpoints land every EVAL_STEPS; touch .done_conc7 and
# re-run to eval the best checkpoint), and so the 9/10 stage-2 leg can be
# skipped under time pressure (HELDOUT_RUN_JPQ9=0) — the core ordering
# claim needs only opq / jpq_only / conc_index.
# While stage 7 trains, a watcher persists the best-by-valid-MRR
# checkpoint to the repo every ~15 min so a host reset mid-training
# degrades to "eval the persisted best" instead of a full retrain.
if [ ! -f "${WS}/.done_conc7" ]; then
  ( LAST=""
    while true; do
      sleep 900
      [ -d "${CONC_BEST}" ] || continue
      CUR=$(find "${CONC_BEST}" -type f -printf '%T@ %p\n' 2>/dev/null | md5sum)
      [ "${CUR}" = "${LAST}" ] && continue
      LAST="${CUR}"
      bash "${PERSIST}" save r5h_m12_conc_best "${CONC_BEST}" >> "${QLOG}" 2>&1
    done ) &
  WATCH_PID=$!
  echo "${WATCH_PID}" > "${WS}/.watch_pid"
fi
step conc7 bash "${PIPE}" "${WS}/m12.env" 7
[ -f "${WS}/.watch_pid" ] && { kill "$(cat "${WS}/.watch_pid")" 2>/dev/null; rm -f "${WS}/.watch_pid"; }
bash "${PERSIST}" save r5h_m12_conc_best "${CONC_BEST}"
step conc8 bash "${PIPE}" "${WS}/m12.env" 8
persist_metrics
if [ "${HELDOUT_RUN_JPQ9:-1}" = "1" ]; then
  step conc9 bash "${PIPE}" "${WS}/m12.env" 9
  step conc10 bash "${PIPE}" "${WS}/m12.env" 10
  persist_metrics
fi

note "heldout matrix complete"
python - <<EOF
import json, os
root = "${WS}/experiments/synth/m12"
print("leg                MRR@10  NDCG@10  R@100")
for name, p in (("dense (task)", "${WS}/experiments/synth/dense/dev"),
                ("opq", f"{root}/opq_index/dev"),
                ("jpq_only", f"{root}/jpq_only_index/dev"),
                ("repconc", f"{root}/conc_index/dev"),
                ("repconc+jpq", f"{root}/jpq_index/dev")):
    mp = os.path.join(p, "metric.json")
    if os.path.exists(mp):
        m = json.load(open(mp))
        print(f"{name:18s} {m['mrr']['MRR@10']:.4f}  "
              f"{m['ndcg']['NDCG@10']:.4f}  {m['recall']['Recall@100']:.4f}")
    else:
        print(f"{name:18s} (missing: {mp})")
EOF
