#!/bin/bash
# Round-5 execution queue — runs every judged on-chip deliverable in
# VERDICT-r4 value order. All steps are restartable (.done markers; the
# pipeline stages themselves are artifact-cached).
#
#   1. conc_retrain    stage-7 m48-e2e feed model, 200 steps, on the FIXED
#                      inputs (VERDICT r4 weak #4: round 4's data200k step
#                      regenerated /root/ws3/data without re-running
#                      complete_qrels.py, so the valid set was floor-capped
#                      at MRR~0.09 and hard negatives were ~96% false
#                      negatives; qrels + valid + hardneg regenerated
#                      before this queue started)
#   2. feed_gate       asserts the retrain actually converged (valid MRR,
#                      reconstruction RMSE) before 2+ h are spent serving
#                      it, then drops the stale old-model encode shards
#   3. decoded_quality MRR parity of decoded/decoded_int8 vs ADC on a real
#                      trained index (defends the BENCH headline mode)
#   4. heldout         the RepCONC > JPQ > OPQ matrix (VERDICT r4 ask #1)
#   5. e2e_8m8         one-command 8.8M end-to-end (ask #2)
#   6. bench steps     QT_G sweep, depth-1 headline, 1M/8.8M scale tables
#   7. tpu_pytest      full suite on the chip (ask #4a)
#   8. m4 lowmse leg   the 768x-compression training-stability fix (ask #5)
#   9. stretch legs    m12 lowmse, jpq_only siblings, base legs
#
# Chip handoff (replaces the round-3/4 pattern-matching watchdog, VERDICT
# r4 weak #3): this script registers its process-group id in
# /tmp/chip.lock; bench.py (driver-invoked) signals that EXACT pgid and
# waits for it to die, and the queue also stops by itself between steps
# when /tmp/chip_release appears. No process-name matching anywhere.
#
# Usage: setsid nohup bash recipes/round5_queue.sh [ws=/root/ws5] &
set -u
WS=${1:-/root/ws5}
HERE=$(cd "$(dirname "$0")" && pwd)
PIPE="${HERE}/run_pipeline.sh"
REPO=$(cd "${HERE}/.." && pwd)
mkdir -p "${WS}"
QLOG="${WS}/queue_log.txt"
note() { echo "[$(date '+%m-%d %H:%M:%S')] $*" | tee -a "${QLOG}"; }

# Single-instance guard: CLAUDE.md tells every session to launch this
# queue, so a second launch while one is mid-step is expected operator
# input — refuse it instead of double-running training jobs on a 1-core
# host (two concurrent run_train_conc's stomped the same output_dir on
# 08-19; only an 11-min kill window saved the checkpoints).
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
  if [ -n "${STEPS:-}" ] && ! grep -qw "${NAME}" <<< "${STEPS}"; then
    return 0
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

# ---- 1. retrain the e2e feed model on the fixed inputs ----
step conc_retrain bash "${PIPE}" "${WS3}/m48_e2e.env" 7

# ---- 2. gate: don't serve a broken model for 2+ hours ----
feed_gate() {
  set -e
  python - <<'PY'
import re
log = open("/root/ws5/log_conc_retrain.txt").read()
mrrs = [float(m) for m in re.findall(r"'eval_MRR@10': ([0-9.eE+-]+)", log)]
rmses = [float(m) for m in re.findall(r"'w_conc_rmse': ([0-9.eE+-]+)", log)]
print("valid MRR@10 trace:", mrrs)
print("final w_conc_rmse:", rmses[-1] if rmses else None)
assert mrrs and max(mrrs) >= 0.5, \
    "feed model still at the sparse-judgment floor — do NOT serve it"
assert rmses and rmses[-1] < 4.0, "norm inflation persists"
PY
  # encode shards from the old (floor-capped) model are invalid
  rm -rf /root/ws8m/eval
}
step feed_gate feed_gate

# ---- 3. decoded-vs-adc QUALITY parity on a real trained index ----
decoded_quality() {
  set -e
  local EXP=${WS3}/experiments/synth/m48
  for SERVE in pallas decoded decoded_int8; do
    python -m repconc_tpu.cli.run_repconc_eval \
      --model_name_or_path "${EXP}/warmup_model" \
      --corpus_path "${WS3}/data/corpus.tsv" \
      --query_path "${WS3}/data/queries.dev.small.tsv" \
      --qrel_path "${WS3}/data/qrels.dev.small.tsv" \
      --out_corpus_dir "${EXP}/warmup_ivf_index" \
      --out_query_dir "${EXP}/warmup_ivf_index/dev_${SERVE}" \
      --max_seq_length 128 --topk 1000 \
      --index_type ivf --nlist 1024 --nprobe 32 --serving "${SERVE}"
  done
  python - <<'PY'
import json
for serve in ("pallas", "decoded", "decoded_int8"):
    m = json.load(open(f"/root/ws3/experiments/synth/m48/warmup_ivf_index/"
                       f"dev_{serve}/metric.json"))
    print(f"{serve:13s} MRR@10={m['mrr']['MRR@10']:.4f} "
          f"R@100={m['recall']['Recall@100']:.4f}")
PY
}
step decoded_quality decoded_quality

# ---- 4. held-out-encoder matrix (RepCONC > JPQ > OPQ headroom) ----
step heldout bash "${HERE}/synthetic/round4_heldout.sh" "${WS3}" /root/ws4

# ---- 5. one-command 8.8M end-to-end ----
e2e_model() {
  local C=${WS3}/experiments/synth/m48-e2e/conc
  if [ -d "${C}/best" ]; then echo "${C}/best"; else echo "${C}/final"; fi
}
if [ -f "${WS}/.done_feed_gate" ]; then
  step e2e_8m8 bash "${REPO}/recipes/msmarco_scale_e2e.sh" \
    /root/ws8m "$(e2e_model)" 8800000
fi

# ---- 5b. decoded_int8 residency on the REAL 8.8M index (search-only:
#          codes + IVF layout are artifact-cached by 5, so this re-serves
#          the same dev queries through the int8-residency matmul path —
#          the first real-codes datapoint for the headline serving mode
#          at MS MARCO scale) ----
if [ -f "${WS}/.done_e2e_8m8" ]; then
  step e2e_decoded_int8 python -m repconc_tpu.cli.run_repconc_eval \
    --model_name_or_path "$(e2e_model)" \
    --corpus_path /root/ws8m/data/corpus.tsv \
    --query_path /root/ws8m/data/queries.dev.small.tsv \
    --qrel_path /root/ws8m/data/qrels.dev.small.tsv \
    --out_corpus_dir /root/ws8m/eval \
    --out_query_dir /root/ws8m/eval/dev_decoded_int8 \
    --max_seq_length 128 --topk 1000 \
    --index_type ivf --nlist 5000 --nprobe 64 --serving decoded_int8
fi

# ---- 6. kernel sweep + headline + scale tables (bench.py children must
#         not trip the chip-lock handoff: they ARE the lock holder) ----
export REPCONC_CHIP_LOCK_IGNORE=1
step qtg_sweep python recipes/bench_kernel_sweep.py
step depth1_headline env REPCONC_BENCH_DEPTH=1 python bench.py
step scale_1m python recipes/bench_ivf_scale.py \
  --nlist 4096 --lpad 256 --nprobes 16,64 --batches 1200,4800 \
  --serving adc,decoded,decoded_int8
# 8.8M split: batch-4800 x nprobe-128 excluded — its (T*QT_G, Lpad) f32
# score matrix (~6.4 GB) + the 7.9 GB int8 store does not fit 16 GB HBM
step scale_8m8a python recipes/bench_ivf_scale.py \
  --nprobes 16,64,128 --batches 1200 --serving all
step scale_8m8b python recipes/bench_ivf_scale.py \
  --nprobes 16,64 --batches 4800 --serving all

# ---- 7. hardware test suite at HEAD (last full run: round 2) ----
step tpu_pytest timeout 10800 env REPCONC_TEST_TPU=1 \
  python -m pytest tests/ -q

# ---- 8. the 768x point: m4 lowmse leg + anchors ----
make_env() {  # make_env <out.env> <M> [extra lines...]
  local OUT=$1 MM=$2; shift 2
  cat > "${OUT}" <<EOF
FAMILY=synth-bertbase
HF_MODEL_DIR=${WS3}/experiments/synth/dense_pretrain/export_hf
POOLING=mean
METRIC_DENSE=METRIC_IP
M=${MM}
DATA_DIR=${WS3}/data
OUT_ROOT=${WS3}/experiments/synth
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
for MM in 4 12; do
  make_env "${WS3}/m${MM}.env" "${MM}" "MSE_WEIGHT=0.01"
  step "m${MM}_warmup" bash "${PIPE}" "${WS3}/m${MM}.env" 5 || continue
  step "m${MM}_opq_eval" bash "${PIPE}" "${WS3}/m${MM}.env" opq-eval
  make_env "${WS3}/m${MM}_lowmse.env" "${MM}" "MSE_WEIGHT=1e-4" \
    "EXP_TAG=-lowmse" "CONC_STEPS=${LOWMSE_CONC_STEPS:-800}"
  mkdir -p "${WS3}/experiments/synth/m${MM}-lowmse"
  ln -sfn "../m${MM}/warmup_model" \
    "${WS3}/experiments/synth/m${MM}-lowmse/warmup_model"
  step "m${MM}_lowmse" bash "${PIPE}" "${WS3}/m${MM}_lowmse.env" 7 8 9 10
done

# ---- 9. stretch: fresh-encoder comparability legs ----
for MM in 4 12; do
  step "m${MM}_jpq_only" bash "${PIPE}" "${WS3}/m${MM}.env" jpq-train jpq-eval
done
for MM in 4 12 48; do
  step "m${MM}_base" bash "${PIPE}" "${WS3}/m${MM}.env" 7 8 9 10
done

if [ "${FAILED}" = 0 ]; then
  note "queue complete"
else
  note "queue finished with ${FAILED} failures"
fi
python - <<EOF
import json, os
root = "${WS3}/experiments/synth"
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
