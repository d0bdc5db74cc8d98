#!/bin/bash
# Background 8.8M-corpus pretokenizer (session-4 feature, now a script):
# waits for the ws8m datagen to finish, then builds the offline TokenCache
# at nice 19 during chip-training hours so e2e_8m8's encode phase runs
# device-bound (~2x on the dominant phase; msmarco_scale_e2e.sh picks the
# cache up automatically via ${WS}/token_cache/token_meta.json).
#
# Standalone (not part of round5b_queue.sh, which was already running when
# this was written — editing an executing bash script corrupts it). The
# CPU-concurrency exception of CLAUDE.md applies: nice 19, single job.
#
# Usage: setsid nohup bash recipes/ws8m_pretokenize_bg.sh [ws8m=/root/ws8m] &
set -u
WS8M=${1:-/root/ws8m}
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "${HERE}/.." && pwd)
LOG="${WS8M}/pretokenize.log"
mkdir -p "${WS8M}"
[ -f "${WS8M}/token_cache/token_meta.json" ] && exit 0
[ -f "${WS8M}/pretokenize.pid" ] && exit 0
echo $$ > "${WS8M}/pretokenize.pid"
trap 'rm -f "${WS8M}/pretokenize.pid"' EXIT

# wait (up to ~6 h) for the corpus
for _ in $(seq 1 1440); do
  grep -q DATAGEN_WS8M_OK "${WS8M}/datagen.log" 2>/dev/null && break
  sleep 15
done
grep -q DATAGEN_WS8M_OK "${WS8M}/datagen.log" 2>/dev/null || exit 1

cd "${REPO}"
# tokenizer fingerprint is a vocab hash, so the (deterministic) base-model
# dir keys identically to any trained export that shares its vocab
exec nice -n 19 python -m repconc_tpu.cli.run_pretokenize \
  --model_name_or_path /root/ws3/models/synth-bert-base \
  --corpus_path "${WS8M}/data/corpus.tsv" \
  --output_dir "${WS8M}/token_cache" \
  --max_seq_length 128 >> "${LOG}" 2>&1
