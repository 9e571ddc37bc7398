#!/bin/sh
# Full-size (368-config) precise-pipeline parity, end to end, on every
# reference image — the env-gated tests nothing used to run (VERDICT r3
# #6).  Targets the real TPU (TPUPOSE_TEST_PLATFORM=axon,cpu): the
# four full-scale pyramid compiles that take minutes on this box's single
# CPU core take seconds there, and the run exercises the exact
# precision-pinned device path the bench ships.
#
# Part of the round verification checklist (with `python bench.py` and
# `python __graft_entry__.py dryrun 8`); record the outcome in
# BASELINE.md / PROGRESS notes.
#
# Usage: scripts/slow_parity.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
TPUPOSE_SLOW_PARITY=1 TPUPOSE_TEST_PLATFORM="${TPUPOSE_TEST_PLATFORM:-axon,cpu}" \
    exec python -m pytest tests/test_golden_parity.py -q \
    -k full_size "$@"
