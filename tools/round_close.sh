#!/bin/bash
# One-command round close: run the full test suite, then emit every
# round artifact (PLANAUDIT_r{NN}, COVERAGE footer, TESTTIME row,
# ACCURACY_r{NN} — see graft.tools.RoundClose).
#
# Usage: tools/round_close.sh <NN> [note...]
set -euo pipefail
NN="${1:?usage: tools/round_close.sh <NN> [note...]}"
shift
NOTE="${*:-}"
LOG=/tmp/round_close_test.log
start=$(date +%s)
sbt -batch test 2>&1 | tee "$LOG" | tail -6
wall=$(( $(date +%s) - start ))
grep -q "All tests passed" "$LOG" || { echo "round_close: tests failed"; exit 1; }
succ=$(grep -oE "succeeded [0-9]+" "$LOG" | tail -1 | grep -oE "[0-9]+")
suites=$(grep -oE "Suites: completed [0-9]+" "$LOG" | tail -1 | grep -oE "[0-9]+")
sbt -batch "runMain graft.tools.RoundClose $NN $succ $suites $wall $NOTE"
