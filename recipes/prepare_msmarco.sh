#!/bin/bash
# Stage 1: download + unpack MS MARCO passage ranking data (needs network).
# Reference: examples/*/1_prepare_dataset.sh. Produces:
#   corpus.tsv  queries.train.tsv  qrels.train.tsv
#   queries.dev.small.tsv  qrels.dev.small.tsv  (+ TREC'19/'20 topics/qrels)
#
# Every download is guarded by a file-exists check, so pre-placing the
# archives makes the script run fully OFFLINE — tests/test_real_formats.py
# exercises exactly that path with byte-exact fixture files
# (tests/fixtures/msmarco/) matching the real layouts.
set -eu
DATA_DIR=${1:-./data/msmarco-passage}
mkdir -p "${DATA_DIR}" && cd "${DATA_DIR}"
fetch() { [ -f "$(basename "$1")" ] || wget -nc "$1"; }

fetch https://msmarco.z22.web.core.windows.net/msmarcoranking/collectionandqueries.tar.gz
[ -f corpus.tsv ] && [ -f qrels.dev.small.tsv ] || {
  tar -xzvf collectionandqueries.tar.gz
  mv collection.tsv corpus.tsv
}
fetch https://trec.nist.gov/data/deep/2019qrels-pass.txt
fetch https://msmarco.z22.web.core.windows.net/msmarcoranking/msmarco-test2019-queries.tsv.gz
[ -f msmarco-test2019-queries.tsv ] || gunzip -kf msmarco-test2019-queries.tsv.gz
fetch https://trec.nist.gov/data/deep/2020qrels-pass.txt
fetch https://msmarco.z22.web.core.windows.net/msmarcoranking/msmarco-test2020-queries.tsv.gz
[ -f msmarco-test2020-queries.tsv ] || gunzip -kf msmarco-test2020-queries.tsv.gz
