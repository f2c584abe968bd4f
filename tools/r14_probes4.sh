#!/bin/bash
# Round-14 artifact refresh on the final audio band-pair code (triples measured 312s and were rejected): the 10x
# full suite + 50x headline decade (the two whose audio stages changed),
# then the media A/B x5 + full STREAMPROBE (post band-probe-skip code),
# then the bench (q117-q119 changed). Serial.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r14probes4 $(date +%H:%M:%S)] $*"; }

log "ScaleProbe 10x full"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r14.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 10 > /tmp/scaleprobe_r14_10x.log 2>&1 \
  || log "10x FAILED"

log "ScaleProbe 50x headline"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r14_50x.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 50 headline \
  > /tmp/scaleprobe_r14_50x.log 2>&1 || log "50x FAILED"

for rep in 0 1 2 3 4; do
  log "media A/B rep $rep"
  SPARK_GRAFT_AB_REP=$rep SPARK_GRAFT_PROBE_ONLY=media_ingest_heavy \
  SPARK_GRAFT_STREAMPROBE_OUT=/tmp/mediaab_r14_rep$rep.json \
  tools/runmain.sh graft.StreamScaleProbe 10 200 \
    > /tmp/mediaab_r14_rep$rep.log 2>&1 || log "rep $rep FAILED"
done

log "full STREAMPROBE"
tools/runmain.sh graft.StreamScaleProbe 10 200 \
  > /tmp/streamprobe_r14.log 2>&1 || log "STREAMPROBE FAILED"

log "bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=16g \
  tools/runmain.sh graft.Bench > /tmp/bench_r14.log 2>&1 || log "bench FAILED"

log "ALL DONE"
