#!/bin/bash
# Round-14 probe continuation: the first driver ran the 50x decade with
# the FULL stage suite (the committed r13 decades use the `headline`
# subset - the full quadratic-output exact stages are 10x-only), so this
# reruns the decades with the same protocol as r13, re-times the 10x full
# suite at 24g (heap-sizing check for the regressed shuffle stages), and
# finishes with the sf0.1 bench. Serial - one JVM at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r14probes2 $(date +%H:%M:%S)] $*"; }

log "ScaleProbe 10x full (24g heap check)"
SPARK_GRAFT_SCALEPROBE_OUT=/tmp/SCALEPROBE_r14_24g.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 10 > /tmp/scaleprobe_r14_10x_24g.log 2>&1 \
  || log "10x FAILED"

for m in 50 100 200; do
  log "ScaleProbe ${m}x headline"
  SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r14_${m}x.json SPARK_DRIVER_MEM=24g \
    tools/runmain.sh graft.ScaleProbe $m headline \
    > /tmp/scaleprobe_r14_${m}x.log 2>&1 || log "${m}x FAILED"
done

log "bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=16g \
  tools/runmain.sh graft.Bench > /tmp/bench_r14.log 2>&1 || log "bench FAILED"

log "ALL DONE"
