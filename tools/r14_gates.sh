#!/bin/bash
# Round-14 final gate chain on the committed code, serial.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r14gates $(date +%H:%M:%S)] $*"; }

log "ScaleProbe 50x headline (pair layout)"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r14_50x.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 50 headline \
  > /tmp/scaleprobe_r14_50x.log 2>&1 || log "50x FAILED"

log "full sbt test"
sbt -batch test > /tmp/sbt_test_r14_final.log 2>&1 \
  && log "tests OK" || log "TESTS FAILED"

log "full verify sf0.01"
rm -rf /tmp/verify_final
tools/runmain.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_final \
  > /tmp/verify_final.log 2>&1 || log "verify FAILED"
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_final \
  > /tmp/compare_final.log 2>&1 && log "compare OK" || log "COMPARE FAILED"
tail -1 /tmp/compare_final.log

for seed in 42 43; do
  log "fuzz seed $seed"
  python3 tools/fuzzgen.py /tmp/graft-fuzz$seed $seed >> /tmp/fuzz_r14.log 2>&1
  rm -rf /tmp/verify_fuzz$seed
  tools/runmain.sh graft.Verify /tmp/graft-fuzz$seed /tmp/verify_fuzz$seed \
    > /tmp/verify_fuzz$seed.log 2>&1 || log "fuzz $seed verify FAILED"
  python3 tools/compare.py /tmp/graft-fuzz$seed /tmp/verify_fuzz$seed \
    > /tmp/compare_fuzz$seed.log 2>&1 && log "fuzz $seed compare OK" \
    || log "FUZZ $seed COMPARE FAILED"
  tail -1 /tmp/compare_fuzz$seed.log
done

log "hot-skew corpus"
python3 tools/hotgen.py /root/testdata/sf0.01 /tmp/graft-hot >> /tmp/fuzz_r14.log 2>&1
rm -rf /tmp/verify_hot
tools/runmain.sh graft.Verify /tmp/graft-hot /tmp/verify_hot \
  > /tmp/verify_hot.log 2>&1 || log "hot verify FAILED"
python3 tools/compare.py /tmp/graft-hot /tmp/verify_hot \
  > /tmp/compare_hot.log 2>&1 && log "hot compare OK" || log "HOT COMPARE FAILED"
tail -1 /tmp/compare_hot.log

log "ALL DONE"
