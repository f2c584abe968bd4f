#!/bin/bash
# Round-17 FULL-SUITE sf1 correctness record: regenerate the deterministic
# 10x corpus from the CURRENT driver sf0.1 (unchanged since r15 — no
# re-roll this round, verified by fixture digest), run Verify over every
# registered query (now 127 — q126/q127 joined in r17), and compare all
# oracles in DuckDB with CTE materialization. Skip list = the
# output-quadratic all-pairs oracles intractable in single-node DuckDB at
# this volume (q26/q32/q38/q66/q72/q77 — the r15 set).
#
# ADVICE r15 (medium): committed bench artifacts are the FILE graft.Bench
# writes (full query names, full precision — SPARK_GRAFT_BENCH_OUT), never
# the compact stdout line (abbreviated qNN keys, ms-rounded — a round-10
# log-truncation workaround).
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r17sf1 $(date +%H:%M:%S)] $*"; }

SKIP="q26_embedding_neardup,q32_ngram_jaccard,q38_ngram_jaccard_capped,q66_ngram_containment,q72_embedding_keeplist,q77_containment_capped"

log "SfScale 10x"
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.SfScale /root/testdata/sf0.1 /tmp/sf1 10 \
  > /tmp/sfscale_r17.log 2>&1 || { log "SfScale FAILED"; exit 1; }

log "verify FULL suite at sf1"
rm -rf /tmp/verify_sf1_r17
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.Verify /tmp/sf1 /tmp/verify_sf1_r17 \
  > /tmp/verify_sf1_r17.log 2>&1 || log "verify exited nonzero (errors.json records per-query failures)"

log "bench on the same corpus (the record's bench note)"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_full_r17.json \
  tools/runmain.sh graft.Bench > /tmp/bench_sf1_r17.log 2>&1 || log "bench FAILED"
BLINE=$(python3 -c "
import json
d=json.load(open('/tmp/bench_sf1_full_r17.json'))
q=d.get('queries',{})
print(f\"see BENCH_SF1.json ({d['value']}s / {len(q)} queries / {sum(1 for v in q.values() if v<0)} failures)\")")

log "compare + assemble record (ORACLE_MATERIALIZE=1)"
ORACLE_MATERIALIZE=1 python3 tools/sf1_record.py /tmp/sf1 /tmp/verify_sf1_r17 \
  "$SKIP" "$BLINE" CORRECTNESS_SF1.json > /tmp/sf1_record_r17.log 2>&1
rc=$?
tail -3 /tmp/sf1_record_r17.log
python3 - <<'EOF'
import json
d = json.load(open('/tmp/bench_sf1_full_r17.json'))
d["corpus"] = "deterministic 10x SfScale of driver sf0.1 (same corpus as r15-r16 - still no re-roll)"
json.dump(d, open('BENCH_SF1.json', 'w'), indent=1)
print("wrote BENCH_SF1.json (full-name full-precision Bench file, ADVICE r15)")
EOF
log "ALL DONE rc=$rc"
exit $rc
