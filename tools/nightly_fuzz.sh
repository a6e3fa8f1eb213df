#!/usr/bin/env bash
# Nightly / local differential-fuzz profile (r12 verdict item 6).
#
# The three Hypothesis differential fuzz files run in CI at
# SPARK_GRAFT_FUZZ_EXAMPLES=8 — documented in each file as the size
# that MISSED the r12 session exact-gap tie bug (an 8-example budget
# never generated two events exactly `gap` apart).  This profile is
# the budget that is supposed to catch that class: >=50 examples per
# property, across a sweep of fixed Hypothesis seeds so consecutive
# nights explore DIFFERENT corners while any failure stays exactly
# reproducible (re-run with the printed seed).
#
# Usage:
#   tools/nightly_fuzz.sh              # 50 examples, seeds 0 1 2
#   EXAMPLES=100 SEEDS="7 11" tools/nightly_fuzz.sh
#
# Record of sweeps run (append one line per completed sweep):
#   2026-08-16/17 r13 build session: EXAMPLES=50, seeds 0, 1, 2 —
#     all 4 differential properties green at every seed (12 green
#     runs; 29-37 min per seed on this host), no counterexample
#     beyond the permanent @example pins.

set -euo pipefail
cd "$(dirname "$0")/.."

EXAMPLES="${EXAMPLES:-50}"
SEEDS="${SEEDS:-0 1 2}"
FILES="tests/test_fuzz_events_differential.py \
tests/test_fuzz_documents_differential.py \
tests/test_fuzz_embeddings_differential.py"

for seed in $SEEDS; do
    echo "=== fuzz sweep: examples=$EXAMPLES hypothesis-seed=$seed ==="
    SPARK_GRAFT_FUZZ_EXAMPLES="$EXAMPLES" \
        python -m pytest $FILES -q --hypothesis-seed="$seed"
done
echo "fuzz profile complete: examples=$EXAMPLES seeds=[$SEEDS]"
