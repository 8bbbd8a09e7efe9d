#!/bin/bash
# Steal-gated quiet-window bench (verify-skill pattern): probe 30 s of
# hypervisor steal; run the bench only on a quiet host; retry a
# contaminated census. Usage: BENCH_OUT=BENCH_CLEAN_rNN.json tools/bench_gate.sh
cd /root/repo
for attempt in 1 2 3 4 5 6; do
  while true; do
    s0=$(awk '/^cpu /{print $9}' /proc/stat)
    sleep 30
    s1=$(awk '/^cpu /{print $9}' /proc/stat)
    ticks=$((s1-s0))
    load=$(awk '{print int($1)}' /proc/loadavg)
    echo "[gate] attempt $attempt probe: steal=$ticks load=$load $(date +%T)"
    if [ "$ticks" -lt 10 ] && [ "$load" -lt 2 ]; then break; fi
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_DETAIL="${BENCH_OUT:-BENCH_CLEAN.json}" \
    sbt -batch "runMain graft.Bench" > /tmp/bench_gate_attempt_$attempt.log 2>&1
  if grep -q '"contaminated":false' "${BENCH_OUT:-BENCH_CLEAN.json}"; then
    echo "[gate] CLEAN census on attempt $attempt"
    exit 0
  fi
  echo "[gate] attempt $attempt contaminated; retrying"
done
echo "[gate] no clean census in 6 attempts"
exit 1
