#!/bin/bash
# Round-4 chip queue — run AFTER the round-3 queue completes (or is paused):
#   1. full test suite ON THE CHIP (VERDICT round-3 ask #3)
#   2. QT_G x R_TILES kernel-geometry sweep (ask #4, the untested lever)
#   3. depth-1 (round-2 methodology) headline for the same-methodology
#      comparison against round 2's 11,987 QPS
#   4. decoded-residency + large-batch tables at 1M and 8.8M (ask #4's
#      low-nprobe attack)
#   5. held-out-encoder m12 matrix (ask #2)
#
# Steps 2-4 run bench.py in subprocesses: the queue watchdog pattern-kills
# on the driver's bench.py, so this script DISARMS the watchdog around
# those steps (/tmp/watchdog.pid) and re-arms it afterwards.
#
# Usage: bash recipes/round4_chip_queue.sh [workspace=/root/ws4chip]
#   STEPS="name1 name2" limits the run to the named steps (others are
#   filtered, NOT marked done) so the long legs (tpu_pytest, heldout) can
#   be scheduled independently of the quick bench steps.
## SUPERSEDED by recipes/round5_queue.sh (cooperative chip lock, failure
## tracking); kept for round-4 provenance. Its steps are embedded in the
## round-5 queue.
set -u
WS=${1:-/root/ws4chip}
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "${HERE}/.." && pwd)
mkdir -p "${WS}"
QLOG="${WS}/queue_log.txt"
note() { echo "[$(date '+%m-%d %H:%M:%S')] $*" | tee -a "${QLOG}"; }
FAILED=0
step() {
  local NAME=$1; shift
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
disarm() { [ -f /tmp/watchdog.pid ] && kill "$(cat /tmp/watchdog.pid)" \
             2>/dev/null; note "watchdog disarmed"; }
rearm() {
  nohup bash /tmp/queue_watchdog.sh "${1:-7200}" >/dev/null 2>&1 &
  echo $! > /tmp/watchdog.pid
  note "watchdog re-armed ($!)"
}

cd "${REPO}"

# 1. hardware test suite (slow compiles; ~45 fixes landed since round 2)
step tpu_pytest env REPCONC_TEST_TPU=1 python -m pytest tests/ -q

# 2-4 spawn bench.py: watchdog must not fire on them
BENCH_SEL=0
for B in qtg_sweep depth1_headline scale_1m scale_8m8a scale_8m8b; do
  if [ -z "${STEPS:-}" ] || grep -qw "${B}" <<< "${STEPS}"; then
    BENCH_SEL=1
  fi
done
[ "${BENCH_SEL}" = 1 ] && disarm
step qtg_sweep python recipes/bench_kernel_sweep.py
step depth1_headline env REPCONC_BENCH_DEPTH=1 python bench.py
step scale_1m python recipes/bench_ivf_scale.py \
  --nlist 4096 --lpad 256 --nprobes 16,64 --batches 1200,4800 \
  --serving adc,decoded,decoded_int8
# 8.8M split: batch-4800 x nprobe-128 is excluded — its (T*QT_G, Lpad) f32
# score matrix (~6.4 GB) + the 7.9 GB int8 store does not fit 16 GB HBM
step scale_8m8a python recipes/bench_ivf_scale.py \
  --nprobes 16,64,128 --batches 1200 --serving all
step scale_8m8b python recipes/bench_ivf_scale.py \
  --nprobes 16,64 --batches 4800 --serving all
[ "${BENCH_SEL}" = 1 ] && rearm 10800

# 5. decoded-vs-adc QUALITY parity on a REAL trained index (ws3 m48 warmup
#    model + its corpus codes, IVF nlist=1024 nprobe=32): same MRR@10 to
#    bf16/int8 churn is the end-to-end accuracy claim for decoded serving
decoded_quality() {
  set -e
  local WS3=/root/ws3 EXP=/root/ws3/experiments/synth/m48
  for SERVE in pallas decoded decoded_int8; do
    python -m repconc_tpu.cli.run_repconc_eval       --model_name_or_path "${EXP}/warmup_model"       --corpus_path "${WS3}/data/corpus.tsv"       --query_path "${WS3}/data/queries.dev.small.tsv"       --qrel_path "${WS3}/data/qrels.dev.small.tsv"       --out_corpus_dir "${EXP}/warmup_ivf_index"       --out_query_dir "${EXP}/warmup_ivf_index/dev_${SERVE}"       --max_seq_length 128 --topk 1000       --index_type ivf --nlist 1024 --nprobe 32 --serving "${SERVE}"
  done
  python - <<'PYEOF'
import json
for serve in ("pallas", "decoded", "decoded_int8"):
    m = json.load(open(f"/root/ws3/experiments/synth/m48/warmup_ivf_index/"
                       f"dev_{serve}/metric.json"))
    print(f"{serve:13s} MRR@10={m['mrr']['MRR@10']:.4f} "
          f"R@100={m['recall']['Recall@100']:.4f}")
PYEOF
}
step decoded_quality decoded_quality

# 6. held-out matrix (long: stage0 2000 steps + 3 trained legs)
step heldout bash "${HERE}/synthetic/round4_heldout.sh" /root/ws3 /root/ws4

if [ "${FAILED}" = 0 ]; then
  note "round4 chip queue complete"
else
  note "round4 chip queue finished with ${FAILED} failures"
fi
