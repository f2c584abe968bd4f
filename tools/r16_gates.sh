#!/bin/bash
# Round-16 final gate chain on the committed code, serial: full test
# suite, full sf0.01 verify+compare, fuzz seeds, hot-skew corpus, and the
# REFRESHED intermediate cross-engine points for the sf1-skipped
# quadratic pair oracles (VERDICT r15 #6): q38 re-run at 3x on the
# CURRENT corpus geometry, plus a NEW q66 point at the same volume —
# both with ORACLE_MATERIALIZE.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r16gates $(date +%H:%M:%S)] $*"; }

log "full sbt test"
sbt -batch test > /tmp/sbt_test_r16_final.log 2>&1 \
  && log "tests OK" || log "TESTS FAILED"
grep -E "Tests:" /tmp/sbt_test_r16_final.log | tail -1

log "full verify sf0.01"
rm -rf /tmp/verify_final
tools/runmain.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_final \
  > /tmp/verify_final.log 2>&1 || log "verify FAILED"
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_final \
  > /tmp/compare_final.log 2>&1 && log "compare OK" || log "COMPARE FAILED"
tail -1 /tmp/compare_final.log

for seed in 42 43; do
  log "fuzz seed $seed"
  python3 tools/fuzzgen.py /tmp/graft-fuzz$seed $seed >> /tmp/fuzz_r16.log 2>&1
  rm -rf /tmp/verify_fuzz$seed
  tools/runmain.sh graft.Verify /tmp/graft-fuzz$seed /tmp/verify_fuzz$seed \
    > /tmp/verify_fuzz$seed.log 2>&1 || log "fuzz $seed verify FAILED"
  python3 tools/compare.py /tmp/graft-fuzz$seed /tmp/verify_fuzz$seed \
    > /tmp/compare_fuzz$seed.log 2>&1 && log "fuzz $seed compare OK" \
    || log "FUZZ $seed COMPARE FAILED"
  tail -1 /tmp/compare_fuzz$seed.log
done

log "hot-skew corpus"
python3 tools/hotgen.py /root/testdata/sf0.01 /tmp/graft-hot >> /tmp/fuzz_r16.log 2>&1
rm -rf /tmp/verify_hot
tools/runmain.sh graft.Verify /tmp/graft-hot /tmp/verify_hot \
  > /tmp/verify_hot.log 2>&1 || log "hot verify FAILED"
python3 tools/compare.py /tmp/graft-hot /tmp/verify_hot \
  > /tmp/compare_hot.log 2>&1 && log "hot compare OK" || log "HOT COMPARE FAILED"
tail -1 /tmp/compare_hot.log

log "3x cross-engine points for the sf1-skipped pair oracles (q38 + q66)"
rm -rf /tmp/sf03
SPARK_DRIVER_MEM=24g tools/runmain.sh graft.SfScale /root/testdata/sf0.1 /tmp/sf03 3 \
  > /tmp/sfscale_3x_r16.log 2>&1 || log "SfScale 3x FAILED"
rm -rf /tmp/verify_sf03
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 \
  tools/runmain.sh graft.Verify /tmp/sf03 /tmp/verify_sf03 q38 q66 \
  > /tmp/verify_sf03.log 2>&1 || log "3x verify FAILED"
ORACLE_MATERIALIZE=1 python3 tools/compare.py /tmp/sf03 /tmp/verify_sf03 \
  > /tmp/compare_sf03.log 2>&1 || log "3x COMPARE nonzero (subset run - see log)"
grep -E "^(OK|FAIL).*(q38|q66)" /tmp/compare_sf03.log

log "ALL DONE"
