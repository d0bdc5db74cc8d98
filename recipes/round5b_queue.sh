#!/bin/bash
# Round-5 queue, second leg: the machine was RESET mid-round (all of
# /root/ws3, /root/ws4, /root/ws8m wiped; only the git repo survived), so
# recipes/round5_queue.sh's premise — "almost everything it needs is
# already on disk" — no longer holds. This queue rebuilds the workspaces
# from scratch and re-drives the remaining VERDICT-r4 deliverables in
# value order, sized to the session's wall-clock:
#
#   data_ws3      200k synthetic workspace + completed train+dev qrels
#                 (round-4 weak #4 prevention: qrels completed BEFORE any
#                 stage consumes them)
#   data_ws8m     8.8M corpus + completed dev qrels (CPU; runs nice'd in
#                 the background during heldout stage-0 — the only
#                 CPU-concurrency exception, monitored for step inflation)
#   heldout       VERDICT ask #1: the RepCONC > JPQ > OPQ matrix at M=12
#                 (recipes/synthetic/round4_heldout.sh, restartable)
#   e2e feed      m48-e2e warmup + 200-step stage-7 on ws3 FULL data from
#                 the heldout stage-0 export (saves the 75-min ws3 stage-0
#                 rebuild; feed_gate still arbitrates quality)
#   feed_gate     refuse to spend encode hours on a floor-capped model
#   e2e_8m8       VERDICT ask #2: one-command 8.8M end-to-end
#   e2e_int8      decoded_int8 residency on the REAL 8.8M index
#   benches       depth-1 headline, QT_G sweep, scale tables (time-gated)
#
# decoded_quality is NOT re-run: it completed earlier this round and the
# measured table is committed (docs/decoded_parity.json, RESULTS.md).
#
# Chip handoff: registers this pgid in /tmp/chip.lock (bench.py kills the
# REGISTERED pgid only); stops between steps when /tmp/chip_release exists.
#
# Usage: setsid nohup bash recipes/round5b_queue.sh [ws=/root/ws5b] &
set -u
WS=${1:-/root/ws5b}
HERE=$(cd "$(dirname "$0")" && pwd)
PIPE="${HERE}/run_pipeline.sh"
REPO=$(cd "${HERE}/.." && pwd)
mkdir -p "${WS}"
QLOG="${WS}/queue_log.txt"
note() { echo "[$(date '+%m-%d %H:%M:%S')] $*" | tee -a "${QLOG}"; }

if [ -f /tmp/chip.lock ]; then
  OLDPG=$(cat /tmp/chip.lock)
  if [ -n "${OLDPG}" ] && ps -o pid= -g "${OLDPG}" > /dev/null 2>&1; then
    note "another queue instance is alive (pgid ${OLDPG}) — exiting"
    exit 0
  fi
fi
ps -o pgid= -p $$ | tr -d ' ' > /tmp/chip.lock
trap 'rm -f /tmp/chip.lock' EXIT
rm -f /tmp/chip_release
note "queue up (pgid $(cat /tmp/chip.lock))"

FAILED=0
step() {  # step <name> <cmd...>
  local NAME=$1; shift
  if [ -f /tmp/chip_release ]; then
    note "chip release requested — stopping before ${NAME}"; exit 0
  fi
  if [ -f "${WS}/.done_${NAME}" ]; then note "skip ${NAME}"; return 0; fi
  note "start ${NAME}"
  local T0=$(date +%s)
  if "$@" >> "${WS}/log_${NAME}.txt" 2>&1; then
    touch "${WS}/.done_${NAME}"
    note "done ${NAME} ($(( $(date +%s) - T0 ))s)"
  else
    note "FAIL ${NAME} ($(( $(date +%s) - T0 ))s) — see log_${NAME}.txt"
    FAILED=$((FAILED+1))
    return 1
  fi
}

cd "${REPO}"
WS3=/root/ws3
WS4=/root/ws4
WS8M=/root/ws8m

# ---- 0a. 200k workspace (idempotent; a pre-launched generator may
#          already be running — wait for its OK marker instead of racing) ----
data_ws3() {
  for _ in $(seq 1 120); do
    grep -q DATAGEN_WS3_OK "${WS3}/datagen.log" 2>/dev/null && return 0
    pgrep -f make_synth_data > /dev/null 2>&1 || break
    sleep 15
  done
  grep -q DATAGEN_WS3_OK "${WS3}/datagen.log" 2>/dev/null && return 0
  python "${HERE}/synthetic/make_synth_data.py" --out_dir "${WS3}" \
      --n_docs 200000 \
    && python "${HERE}/synthetic/complete_qrels.py" \
      --data_dir "${WS3}/data" --splits train,dev.small
}
step data_ws3 data_ws3 || exit 1

# ---- 0b. 8.8M corpus: CPU-only, nice'd, overlapped with chip training.
#          Only dev qrels are completed (nothing trains on ws8m). ----
if [ ! -f "${WS}/.done_data_ws8m" ] && [ ! -f "${WS8M}/datagen.pid" ]; then
  mkdir -p "${WS8M}"
  setsid nohup nice -n 19 bash -c "
    python '${HERE}/synthetic/make_synth_data.py' --out_dir '${WS8M}' \
      --n_docs 8800000 &&
    python '${HERE}/synthetic/complete_qrels.py' \
      --data_dir '${WS8M}/data' --splits dev.small &&
    echo DATAGEN_WS8M_OK" > "${WS8M}/datagen.log" 2>&1 &
  echo $! > "${WS8M}/datagen.pid"
  note "ws8m datagen launched in background (nice 19)"
fi

# ---- 1. held-out-encoder matrix (VERDICT r4 ask #1) ----
step heldout env HELDOUT_CONC_STEPS=${HELDOUT_CONC_STEPS:-800} \
  HELDOUT_RUN_JPQ9=${HELDOUT_RUN_JPQ9:-1} \
  bash "${HERE}/synthetic/round4_heldout.sh" "${WS3}" "${WS4}"
step heldout_table python "${HERE}/synthetic/print_heldout_table.py" "${WS4}"

# ---- 2. e2e feed model: m48 warmup + 200-step stage-7 on ws3 full data,
#         starting from the heldout stage-0 export (same corpus, same
#         vocabulary; stage 7 adapts both sides on the full-subtopic
#         train split; feed_gate arbitrates) ----
make_e2e_env() {
  cat > "${WS3}/m48_e2e.env" <<EOF
FAMILY=synth-bertbase
HF_MODEL_DIR=${WS4}/experiments/synth/dense_pretrain/export_hf
POOLING=mean
METRIC_DENSE=METRIC_IP
M=48
EXP_TAG=-e2e
DATA_DIR=${WS3}/data
OUT_ROOT=${WS3}/experiments/synth
GLOBAL_BATCH=256
CACHE_CHUNK=128
CONC_STEPS=200
EVAL_STEPS=100
MAX_DOC_LEN_EVAL=128
MAX_POSITIVES=160
CONC_LR=2e-6
CONC_CENTROID_LR=1e-3
MSE_WEIGHT=0.01
EOF
}
make_e2e_env
# Reset-proofing: if a prior session already trained + gated the feed
# model, restore it from the repo artifact instead of retraining (the
# gate was measured before the tarball was committed — see feed_gate).
PERSIST="${HERE}/persist_artifacts.sh"
E2E_BEST="${WS3}/experiments/synth/m48-e2e/conc/best"
if [ ! -f "${WS}/.done_e2e_conc7" ] \
    && bash "${PERSIST}" restore r5_m48e2e_conc_best "${E2E_BEST}"; then
  touch "${WS}/.done_e2e_shared" "${WS}/.done_e2e_conc7" \
        "${WS}/.done_feed_gate"
  note "e2e feed model restored from repo artifact (gate carried over)"
fi
step e2e_shared bash "${PIPE}" "${WS3}/m48_e2e.env" 2 3 4 5 6
step e2e_conc7 bash "${PIPE}" "${WS3}/m48_e2e.env" 7

# ---- 3. gate: don't serve a broken model for 2 hours ----
feed_gate() {
  python - <<'PY'
import re
log = open("/root/ws5b/log_e2e_conc7.txt").read()
mrrs = [float(m) for m in re.findall(r"'eval_MRR@10': ([0-9.eE+-]+)", log)]
rmses = [float(m) for m in re.findall(r"'w_conc_rmse': ([0-9.eE+-]+)", log)]
print("valid MRR@10 trace:", mrrs)
print("final w_conc_rmse:", rmses[-1] if rmses else None)
assert mrrs and max(mrrs) >= 0.5, \
    "feed model still at the sparse-judgment floor - do NOT serve it"
assert rmses and rmses[-1] < 4.0, "norm inflation persists"
PY
}
step feed_gate feed_gate
# only a gate-passing model is worth persisting
[ -f "${WS}/.done_feed_gate" ] \
  && bash "${PERSIST}" save r5_m48e2e_conc_best "${E2E_BEST}"

# ---- 4. one-command 8.8M end-to-end (waits for the background datagen) ----
e2e_model() {
  local C=${WS3}/experiments/synth/m48-e2e/conc
  if [ -d "${C}/best" ]; then echo "${C}/best"; else echo "${C}/final"; fi
}
wait_ws8m() {
  for _ in $(seq 1 240); do
    grep -q DATAGEN_WS8M_OK "${WS8M}/datagen.log" 2>/dev/null && return 0
    sleep 15
  done
  note "ws8m datagen never finished"; return 1
}
step data_ws8m wait_ws8m
if [ -f "${WS}/.done_feed_gate" ] && [ -f "${WS}/.done_data_ws8m" ]; then
  step e2e_8m8 bash "${REPO}/recipes/msmarco_scale_e2e.sh" \
    "${WS8M}" "$(e2e_model)" 8800000
fi

# ---- 5. decoded_int8 residency on the REAL 8.8M index (search-only:
#          codes + IVF layout are artifact-cached by step 4) ----
if [ -f "${WS}/.done_e2e_8m8" ]; then
  step e2e_decoded_int8 python -m repconc_tpu.cli.run_repconc_eval \
    --model_name_or_path "$(e2e_model)" \
    --corpus_path "${WS8M}/data/corpus.tsv" \
    --query_path "${WS8M}/data/queries.dev.small.tsv" \
    --qrel_path "${WS8M}/data/qrels.dev.small.tsv" \
    --out_corpus_dir "${WS8M}/eval" \
    --out_query_dir "${WS8M}/eval/dev_decoded_int8" \
    --max_seq_length 128 --topk 1000 \
    --index_type ivf --nlist 5000 --nprobe 64 --serving decoded_int8
fi

# ---- 6. benches (time-gated; the driver's end-of-round bench.py measures
#         the headline regardless — these add the scale/depth tables) ----
export REPCONC_CHIP_LOCK_IGNORE=1
step depth1_headline env REPCONC_BENCH_DEPTH=1 python bench.py
step scale_8m8b python recipes/bench_ivf_scale.py \
  --nprobes 16,64 --batches 4800 --serving all
step qtg_sweep python recipes/bench_kernel_sweep.py
step scale_1m python recipes/bench_ivf_scale.py \
  --nlist 4096 --lpad 256 --nprobes 16,64 --batches 1200,4800 \
  --serving adc,decoded,decoded_int8
step scale_8m8a python recipes/bench_ivf_scale.py \
  --nprobes 16,64,128 --batches 1200 --serving all

# persist bench logs (small text) so measured tables survive a reset
mkdir -p "${REPO}/docs/bench_r5"
for b in depth1_headline scale_8m8b qtg_sweep scale_1m scale_8m8a \
         e2e_8m8 e2e_decoded_int8; do
  [ -f "${WS}/log_${b}.txt" ] && cp "${WS}/log_${b}.txt" "${REPO}/docs/bench_r5/"
done
cd "${REPO}"
git add docs/bench_r5 > /dev/null 2>&1
git diff --cached --quiet || git commit -q -m "bench r5: persist measured bench logs (auto)"

if [ "${FAILED}" = 0 ]; then
  note "queue complete"
else
  note "queue finished with ${FAILED} failures"
fi
