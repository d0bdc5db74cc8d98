#!/bin/bash
# Reset-proofing: the host has been wiped mid-round twice (2026-08-19,
# 2026-08-20), losing hours of chip training each time because trained
# models lived only in /root/ws*. Only /root/repo survives a reset, so
# the round-5 queue calls this script after each expensive milestone to
# tar the artifact into artifacts/ and commit it. round4_heldout.sh
# restores from these tarballs on startup, turning a reset into a
# skip-cache hit instead of a 75-min stage-0 retrain.
#
# Usage: persist_artifacts.sh <save|restore> <tag> <dir>
#   save:    tar -C $(dirname dir) $(basename dir) -> artifacts/<tag>.tar,
#            commit. No-op if dir missing.
#   restore: untar artifacts/<tag>.tar into $(dirname dir) if dir absent.
#            Exit 0 with "restored" on success, exit 1 if no tarball.
set -u
MODE=$1; TAG=$2; DIR=$3
REPO=$(cd "$(dirname "$0")/.." && pwd)
ART="${REPO}/artifacts"
TAR="${ART}/${TAG}.tar"
case "${MODE}" in
  save)
    [ -d "${DIR}" ] || { echo "persist: ${DIR} missing, skip"; exit 0; }
    mkdir -p "${ART}"
    tar -C "$(dirname "${DIR}")" -cf "${TAR}.tmp" "$(basename "${DIR}")" \
      && mv "${TAR}.tmp" "${TAR}"
    cd "${REPO}"
    git add -f "artifacts/${TAG}.tar" > /dev/null
    # Commit only if the tarball actually changed (tar of identical tree
    # differs in mtimes; that is fine — a changed model must re-commit).
    # pathspec commit: never sweep up files another process has staged
    if ! git diff --cached --quiet -- "artifacts/${TAG}.tar"; then
      git commit -q -m "artifacts: persist ${TAG} ($(du -h "${TAR}" | cut -f1 | tr -d ' '))" \
        -- "artifacts/${TAG}.tar"
      echo "persist: committed ${TAG}"
    else
      echo "persist: ${TAG} unchanged"
    fi
    ;;
  restore)
    [ -d "${DIR}" ] && { echo "persist: ${DIR} already present"; exit 0; }
    [ -f "${TAR}" ] || { echo "persist: no tarball for ${TAG}"; exit 1; }
    mkdir -p "$(dirname "${DIR}")"
    tar -C "$(dirname "${DIR}")" -xf "${TAR}"
    echo "persist: restored ${TAG} -> ${DIR}"
    ;;
  *) echo "usage: persist_artifacts.sh <save|restore> <tag> <dir>"; exit 2;;
esac
