#!/bin/bash
# Sequentially re-verify the sf1 gates that carried r11 verdicts, one
# DuckDB process at a time (heavy sf1 oracles must run SOLO — a
# concurrent sbt suite caused a thread-exhaustion abort in r12 wave 1).
# Usage: scripts/run_carried_sf1.sh [gate ...]   (default: all 10)
set -u -o pipefail
GATES=("$@")
if [ ${#GATES[@]} -eq 0 ]; then
  GATES=(dedup_incremental dedup_incremental_prestaged dedup_incremental_loop \
         dedup_keep_best dedup_corpus_clean corpus_curate \
         emb_recall_ivfpq_trained_kc64 emb_recall_ivfpq_trained \
         emb_recall_ivfpq_trained_m32 emb_recall_ivfpq_refined)
fi
LOG=target/carried_sf1.log
mkdir -p target
FAILED=()
for g in "${GATES[@]}"; do
  echo "=== $g start $(date +%H:%M:%S)" | tee -a "$LOG"
  t0=$(date +%s)
  if GRAFT_DUCKDB_MEM=80GB GRAFT_DUCKDB_THREADS=28 \
      python3 scripts/check.py target/sf1 target/verify_sf1 "^${g}\$" \
      2>&1 | tail -4 | tee -a "$LOG"; then
    status=PASS
  else
    status=FAIL
    FAILED+=("$g")
  fi
  t1=$(date +%s)
  echo "=== $g $status in $((t1-t0))s" | tee -a "$LOG"
done
if [ ${#FAILED[@]} -gt 0 ]; then
  echo "SWEEP FAIL: ${FAILED[*]}" | tee -a "$LOG"
  exit 1
fi
echo "SWEEP PASS: all ${#GATES[@]} gates" | tee -a "$LOG"
