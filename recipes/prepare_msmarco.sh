#!/bin/bash
# Stage 1: download + unpack MS MARCO passage ranking data (needs network).
# Reference: examples/*/1_prepare_dataset.sh. Produces:
#   corpus.tsv  queries.train.tsv  qrels.train.tsv
#   queries.dev.small.tsv  qrels.dev.small.tsv  (+ TREC'19/'20 topics/qrels)
set -eu
DATA_DIR=${1:-./data/msmarco-passage}
mkdir -p "${DATA_DIR}" && cd "${DATA_DIR}"
wget -nc https://msmarco.z22.web.core.windows.net/msmarcoranking/collectionandqueries.tar.gz
tar -xzvf collectionandqueries.tar.gz
mv collection.tsv corpus.tsv
wget -nc https://trec.nist.gov/data/deep/2019qrels-pass.txt
wget -nc https://msmarco.z22.web.core.windows.net/msmarcoranking/msmarco-test2019-queries.tsv.gz && gunzip -kf msmarco-test2019-queries.tsv.gz
wget -nc https://trec.nist.gov/data/deep/2020qrels-pass.txt
wget -nc https://msmarco.z22.web.core.windows.net/msmarcoranking/msmarco-test2020-queries.tsv.gz && gunzip -kf msmarco-test2020-queries.tsv.gz
