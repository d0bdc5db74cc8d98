#!/bin/bash
# ONE-COMMAND MS MARCO-scale rehearsal: encode 8.8M docs with a real
# bert-base RepCONC model -> build the IVF index -> serve dev queries with
# the Pallas cell-grouped kernel, all through the standard eval CLI (the
# same stage-8 invocation every recipe runs — reference:
# evaluate/run_repconc_eval.py:38-59 at its MS MARCO scale).
#
# Per-phase wall-clock (corpus load / tokenize / device encode / IVF build /
# search) lands in <ws>/eval/dev/timings.json via the CLI's Stopwatch.
#
# The corpus is generated with the same vocabulary as the 200k-doc
# rehearsal (deterministic for the default topic geometry), so a model
# trained by recipes/synthetic/run_synth.sh scores real, structured codes.
#
# Usage:
#   bash recipes/msmarco_scale_e2e.sh <workspace> <model_dir> [n_docs]
#   e.g. bash recipes/msmarco_scale_e2e.sh /root/ws8m \
#          /root/synth_ws3/experiments/synth/m48/conc/best 8800000
set -eu
WS=$1
MODEL=$2
NDOCS=${3:-8800000}
HERE=$(cd "$(dirname "$0")" && pwd)

if [ ! -f "${WS}/data/corpus.tsv" ]; then
  python "${HERE}/synthetic/make_synth_data.py" --out_dir "${WS}" \
    --n_docs "${NDOCS}"
fi

# offline tokens (cli/run_pretokenize.py) make the encode device-bound on
# this 1-core host; the flag is a no-op fallback if the cache is absent or
# stale (exact-keyed on corpus/tokenizer/length)
TOKEN_CACHE_FLAG=""
if [ -f "${WS}/token_cache/token_meta.json" ]; then
  TOKEN_CACHE_FLAG="--token_cache_dir ${WS}/token_cache"
fi

T0=$(date +%s)
python -m repconc_tpu.cli.run_repconc_eval \
    --model_name_or_path "${MODEL}" \
    --corpus_path "${WS}/data/corpus.tsv" \
    --query_path "${WS}/data/queries.dev.small.tsv" \
    --qrel_path "${WS}/data/qrels.dev.small.tsv" \
    --out_corpus_dir "${WS}/eval" \
    --out_query_dir "${WS}/eval/dev" \
    --max_seq_length ${MAX_SEQ_LEN:-128} --topk ${TOPK:-1000} \
    --index_type ivf --nlist ${NLIST:-5000} --nprobe ${NPROBE:-64} \
    --serving ${SERVING:-auto} ${TOKEN_CACHE_FLAG}
echo "end-to-end wall: $(( $(date +%s) - T0 ))s"
cat "${WS}/eval/dev/timings.json"
