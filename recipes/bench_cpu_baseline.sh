#!/bin/bash
# Build + run the single-core CPU IVF-ADC baseline (grounds vs_baseline;
# see native/cpu_ivfpq_baseline.cpp). Prints one JSON line per arm.
set -eu
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "${HERE}/.." && pwd)
BIN=/tmp/cpu_ivfpq_baseline
g++ -O3 -march=native -std=c++17 -o "${BIN}" \
  "${REPO}/native/cpu_ivfpq_baseline.cpp"
exec "${BIN}"
