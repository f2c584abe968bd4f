#!/bin/bash
# Round-14 focused sf1 point: regenerate the deterministic 10x corpus and
# cross-check the queries whose SEMANTICS changed this round (derived
# nprobe: q36/q106/q120/q121; calibrated PQ floor: q107/q110/q122 plus the
# q92/q95 serving twins; BPE depth: q123) at sf1. The full-suite sf1
# record remains r13's CORRECTNESS_SF1; q117-q119's sf1 point is this
# round's CORRECTNESS_SF1_Q119 (same audio code).
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r14sf1 $(date +%H:%M:%S)] $*"; }

log "SfScale 10x"
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.SfScale /root/testdata/sf0.1 /tmp/sf1 10 \
  > /tmp/sfscale_r14.log 2>&1 || { log "SfScale FAILED"; exit 1; }

log "verify changed queries at sf1"
rm -rf /tmp/verify_sf1_r14
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.Verify /tmp/sf1 /tmp/verify_sf1_r14 \
  q36 q92 q95 q106 q107 q110 q120 q121 q122 q123 \
  > /tmp/verify_sf1_r14.log 2>&1 || log "verify FAILED"

log "compare"
ORACLE_MATERIALIZE=1 python3 tools/compare.py /tmp/sf1 /tmp/verify_sf1_r14 \
  > /tmp/compare_sf1_r14.log 2>&1 || true
grep -E 'OK|FAIL' /tmp/compare_sf1_r14.log | grep -vE 'unreadable'
log "ALL DONE"
