#!/bin/bash
# Round-19 gate chain — the r18 template unchanged (gates: full test, full
# sf0.01 verify+compare with driver-shaped record, fuzz 42/43, hot-skew,
# claims, final bench).
#  - ADVICE r17: a failed Verify no longer lets the compare append a
#    SECOND line under the same gate name — the chain records the failure
#    and SKIPS that corpus's compare (each gate has exactly one line).
#  - VERDICT r17 #2: the full-suite compare also writes the DRIVER-shaped
#    per-query record (rows_match/schema_match/hash_match/...) via
#    DRIVER_JSON, committed as CORRECTNESS_LOCAL_r19.json beside the
#    jsonl — the contract-shaped record exists even if the driver's own
#    end-of-round file comes out empty a third time.
set -uo pipefail
cd "$(dirname "$0")/.."
G=GATES_r19.json
log() { echo "[r19gates $(date +%H:%M:%S)] $*"; }
gate() { tools/gate_append.sh "$G" "$@"; }

log "full sbt test"
sbt -batch test > /tmp/sbt_test_r19_final.log 2>&1
TESTLINE=$(grep -E "Tests:" /tmp/sbt_test_r19_final.log | tail -1 | sed 's/^\[info\] *//')
gate sbt_test "${TESTLINE:-NO Tests: line found (run died - see /tmp/sbt_test_r19_final.log)}"

# corpus gates: (name, generator-or-empty, data dir)
run_corpus() {
  local name="$1" dir="$2"
  rm -rf "/tmp/verify_$name"
  if ! tools/runmain.sh graft.Verify "$dir" "/tmp/verify_$name" \
      > "/tmp/verify_$name.log" 2>&1; then
    gate "$name" "VERIFY FAILED (nonzero exit) - compare skipped"
    return 1
  fi
  local extra=()
  if [ "$name" = "sf001" ]; then
    COMPARE_JSON=CORRECTNESS_R19_LOCAL.jsonl DRIVER_JSON=CORRECTNESS_LOCAL_r19.json \
      python3 tools/compare.py "$dir" "/tmp/verify_$name" \
      > "/tmp/compare_$name.log" 2>&1
    git add CORRECTNESS_R19_LOCAL.jsonl CORRECTNESS_LOCAL_r19.json
    git commit -q -m "Round-19 per-query correctness records (sf0.01 full suite, jsonl + driver shape)" \
      -- CORRECTNESS_R19_LOCAL.jsonl CORRECTNESS_LOCAL_r19.json || true
  else
    python3 tools/compare.py "$dir" "/tmp/verify_$name" \
      > "/tmp/compare_$name.log" 2>&1
  fi
  gate "$name" "$(tail -1 /tmp/compare_$name.log)"
}

log "full verify sf0.01"
run_corpus sf001 /root/testdata/sf0.01 || true

for seed in 42 43; do
  log "fuzz seed $seed"
  python3 tools/fuzzgen.py /tmp/graft-fuzz$seed $seed >> /tmp/fuzz_r19.log 2>&1
  run_corpus fuzz$seed /tmp/graft-fuzz$seed || true
done

log "hot-skew corpus"
python3 tools/hotgen.py /root/testdata/sf0.01 /tmp/graft-hot >> /tmp/fuzz_r19.log 2>&1
run_corpus hot_skew /tmp/graft-hot || true

log "claims gate (over the chain's own logs; bench logs get their own run)"
if python3 tools/claims_gate.py /tmp/sbt_test_r19_final.log > /tmp/claims_r19.log 2>&1; then
  gate claims "$(grep -c PASS /tmp/claims_r19.log) PASS lines over sbt test log, 0 failures"
else
  gate claims "CLAIMS GATE FAILED: $(tail -1 /tmp/claims_r19.log)"
fi

log "bench sf0.1 (3-rep medians -> BENCH.json)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=BENCH.json SPARK_DRIVER_MEM=16g \
  tools/runmain.sh graft.Bench > /tmp/bench_r19.log 2>&1 || log "bench exited nonzero"
if [ -s BENCH.json ]; then
  BLINE=$(python3 -c "
import json
d=json.load(open('BENCH.json'))
q=d.get('queries',{})
print(f\"{d['value']:.1f}s / {len(q)} queries / {d.get('failed','?')} failures / reps={d.get('reps','?')} medians cpus={d.get('cpus','?')}\")")
  python3 tools/claims_gate.py /tmp/bench_r19.log > /tmp/claims_bench_r19.log 2>&1 \
    && BLINE="$BLINE; claims: $(grep -c PASS /tmp/claims_bench_r19.log) PASS over bench log" \
    || BLINE="$BLINE; CLAIMS FAILED over bench log"
  git add BENCH.json
  git commit -q -m "Round-19 bench record (sf0.1, 3-rep medians)" -- BENCH.json || true
  gate bench_sf01 "$BLINE"
else
  gate bench_sf01 "BENCH.json missing or empty (run died - see /tmp/bench_r19.log)"
fi

log "ALL DONE"
