#!/bin/bash
# Round-17 final gate chain — COMMIT-PROOF edition (VERDICT r16 #1/#2):
# every gate appends its one-line result to GATES_r17.json and commits it
# AS IT RUNS (tools/gate_append.sh), the full-suite compare writes a
# per-query CORRECTNESS_R17_LOCAL.jsonl that is committed even if the
# driver's own record fails again, and the subset (3x) compares use
# compare.py --only so a dead oracle process can never masquerade as
# "subset run, expected unreadables".
set -uo pipefail
cd "$(dirname "$0")/.."
G=GATES_r17.json
log() { echo "[r17gates $(date +%H:%M:%S)] $*"; }
gate() { tools/gate_append.sh "$G" "$@"; }

log "full sbt test"
sbt -batch test > /tmp/sbt_test_r17_final.log 2>&1
TESTLINE=$(grep -E "Tests:" /tmp/sbt_test_r17_final.log | tail -1 | sed 's/^\[info\] *//')
gate sbt_test "${TESTLINE:-NO Tests: line found (run died - see /tmp/sbt_test_r17_final.log)}"

log "full verify sf0.01"
rm -rf /tmp/verify_final
tools/runmain.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_final \
  > /tmp/verify_final.log 2>&1 || gate verify_sf001 "VERIFY FAILED (nonzero exit)"
COMPARE_JSON=CORRECTNESS_R17_LOCAL.jsonl \
  python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_final \
  > /tmp/compare_final.log 2>&1
CMPLINE=$(tail -1 /tmp/compare_final.log)
git add CORRECTNESS_R17_LOCAL.jsonl
git commit -q -m "Round-17 per-query correctness record (sf0.01 full suite)" \
  -- CORRECTNESS_R17_LOCAL.jsonl || true
gate compare_sf001 "${CMPLINE:-compare produced no output (process died)}"

for seed in 42 43; do
  log "fuzz seed $seed"
  python3 tools/fuzzgen.py /tmp/graft-fuzz$seed $seed >> /tmp/fuzz_r17.log 2>&1
  rm -rf /tmp/verify_fuzz$seed
  tools/runmain.sh graft.Verify /tmp/graft-fuzz$seed /tmp/verify_fuzz$seed \
    > /tmp/verify_fuzz$seed.log 2>&1 || gate fuzz$seed "VERIFY FAILED (nonzero exit)"
  python3 tools/compare.py /tmp/graft-fuzz$seed /tmp/verify_fuzz$seed \
    > /tmp/compare_fuzz$seed.log 2>&1
  gate fuzz$seed "$(tail -1 /tmp/compare_fuzz$seed.log)"
done

log "hot-skew corpus"
python3 tools/hotgen.py /root/testdata/sf0.01 /tmp/graft-hot >> /tmp/fuzz_r17.log 2>&1
rm -rf /tmp/verify_hot
tools/runmain.sh graft.Verify /tmp/graft-hot /tmp/verify_hot \
  > /tmp/verify_hot.log 2>&1 || gate hot_skew "VERIFY FAILED (nonzero exit)"
python3 tools/compare.py /tmp/graft-hot /tmp/verify_hot \
  > /tmp/compare_hot.log 2>&1
gate hot_skew "$(tail -1 /tmp/compare_hot.log)"

log "claims gate (over the chain's own logs; bench logs get their own run)"
python3 tools/claims_gate.py /tmp/sbt_test_r17_final.log > /tmp/claims_r17.log 2>&1 \
  && gate claims "$(grep -c PASS /tmp/claims_r17.log) PASS lines over sbt test log" \
  || gate claims "CLAIMS GATE FAILED: $(tail -1 /tmp/claims_r17.log)"

log "ALL DONE"
