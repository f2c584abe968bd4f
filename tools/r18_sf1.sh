#!/bin/bash
# Round-18 FULL-SUITE sf1 correctness record. Changes from r17:
#  - q26/q72 are NO LONGER skipped: the embedding all-pairs oracles proved
#    cheap in DuckDB at the full 10x volume (~50s each with CTE
#    materialization — CORRECTNESS_3X_R18.json), so the skip list shrinks
#    to the four text quadratic shapes (q32/q38/q66/q77), each of which
#    has a committed above-sf0.1 point of its own shape family (q38/q66
#    at 3x, CORRECTNESS_3X_R17.json).
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r18sf1 $(date +%H:%M:%S)] $*"; }

SKIP="q32_ngram_jaccard,q38_ngram_jaccard_capped,q66_ngram_containment,q77_containment_capped"

if [ ! -f /tmp/sf1/_GRAFT_SFSCALE_DONE ]; then
  log "SfScale 10x"
  rm -rf /tmp/sf1
  SPARK_DRIVER_MEM=24g tools/runmain.sh graft.SfScale /root/testdata/sf0.1 /tmp/sf1 10 \
    > /tmp/sfscale_r18sf1.log 2>&1 || { log "SfScale FAILED"; exit 1; }
  touch /tmp/sf1/_GRAFT_SFSCALE_DONE
else
  log "SfScale 10x already done (marker present)"
fi

log "verify FULL suite at sf1"
rm -rf /tmp/verify_sf1_r18
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.Verify /tmp/sf1 /tmp/verify_sf1_r18 \
  > /tmp/verify_sf1_r18.log 2>&1 || log "verify exited nonzero (errors.json records per-query failures)"

log "bench on the same corpus (the record's bench note)"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_full_r18.json \
  tools/runmain.sh graft.Bench > /tmp/bench_sf1_r18.log 2>&1 || log "bench FAILED"
BLINE=$(python3 -c "
import json
d=json.load(open('/tmp/bench_sf1_full_r18.json'))
q=d.get('queries',{})
print(f\"see BENCH_SF1.json ({d['value']}s / {len(q)} queries / {sum(1 for v in q.values() if v<0)} failures / local[{d.get('cpus','?')}])\")")

log "compare + assemble record (ORACLE_MATERIALIZE=1, bounded DuckDB)"
ORACLE_MATERIALIZE=1 DUCKDB_MEM=60GB DUCKDB_TMP=/tmp/duckspill_sf1 \
  python3 tools/sf1_record.py /tmp/sf1 /tmp/verify_sf1_r18 \
  "$SKIP" "$BLINE" CORRECTNESS_SF1.json > /tmp/sf1_record_r18.log 2>&1
rc=$?
tail -3 /tmp/sf1_record_r18.log
python3 - <<'EOF'
import json
d = json.load(open('/tmp/bench_sf1_full_r18.json'))
d["corpus"] = "deterministic 10x SfScale of driver sf0.1 (same corpus as r15-r17 - still no re-roll)"
json.dump(d, open('BENCH_SF1.json', 'w'), indent=1)
print("wrote BENCH_SF1.json (full-name full-precision Bench file, ADVICE r15)")
EOF
log "ALL DONE rc=$rc"
exit $rc
