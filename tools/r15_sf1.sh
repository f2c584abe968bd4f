#!/bin/bash
# Round-15 FULL-SUITE sf1 correctness record (VERDICT r14 #1): the r13
# record was r13 code on the pre-re-roll corpus; this regenerates the
# deterministic 10x corpus from the CURRENT driver sf0.1, runs Verify over
# every registered query, and compares all oracles in DuckDB with CTE
# materialization. Skip list = the output-quadratic all-pairs oracles that
# are intractable in single-node DuckDB at this volume (q26/q32/q38/q66/
# q72/q77 — same set as r13 MINUS q119, whose oracle is now the unrolled
# star rounds and runs in ~24s, CORRECTNESS_SF1_Q119).
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r15sf1 $(date +%H:%M:%S)] $*"; }

SKIP="q26_embedding_neardup,q32_ngram_jaccard,q38_ngram_jaccard_capped,q66_ngram_containment,q72_embedding_keeplist,q77_containment_capped"

log "SfScale 10x"
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.SfScale /root/testdata/sf0.1 /tmp/sf1 10 \
  > /tmp/sfscale_r15.log 2>&1 || { log "SfScale FAILED"; exit 1; }

log "verify FULL suite at sf1"
rm -rf /tmp/verify_sf1_r15
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.Verify /tmp/sf1 /tmp/verify_sf1_r15 \
  > /tmp/verify_sf1_r15.log 2>&1 || log "verify exited nonzero (errors.json records per-query failures)"

log "bench on the same corpus (the record's bench note)"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_DRIVER_MEM=24g tools/runmain.sh graft.Bench \
  > /tmp/bench_sf1_r15.log 2>&1 || log "bench FAILED"
BLINE=$(grep '^{' /tmp/bench_sf1_r15.log | tail -1 | python3 -c "
import json,sys
d=json.loads(sys.stdin.read())
q=d.get('queries',{})
print(f\"see BENCH_SF1.json ({d['value']}s / {len(q)} queries / {sum(1 for v in q.values() if v<0)} failures)\")")
grep '^{' /tmp/bench_sf1_r15.log | tail -1 > /tmp/bench_sf1_line.json

log "compare + assemble record (ORACLE_MATERIALIZE=1)"
ORACLE_MATERIALIZE=1 python3 tools/sf1_record.py /tmp/sf1 /tmp/verify_sf1_r15 \
  "$SKIP" "$BLINE" CORRECTNESS_SF1.json > /tmp/sf1_record_r15.log 2>&1
rc=$?
tail -3 /tmp/sf1_record_r15.log
python3 - <<'EOF'
import json
d = json.load(open('/tmp/bench_sf1_line.json'))
d["corpus"] = "deterministic 10x SfScale of driver sf0.1 (round-15 re-roll)"
json.dump(d, open('BENCH_SF1.json', 'w'), indent=1)
print("wrote BENCH_SF1.json")
EOF
log "ALL DONE rc=$rc"
exit $rc
