#!/bin/bash
# TAS-Balanced compression sweep M=48/24/16/8 (64x-768x), recall-vs-memory
# curve (BASELINE.json config 3; reference README.md:21 claims the range).
# Runs stages 5-10 per M after the shared stages 1-4 have completed once.
set -eu
HERE=$(dirname "$0")
for M in 48 24 16 8; do
  M=${M} bash "${HERE}/run_pipeline.sh" tas-balanced.env 5 6 7 8 9 10
done
