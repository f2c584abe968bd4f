#!/bin/bash
# Round-15 probe refresh on the final media/audio code, serial:
# media A/B x5 (arm order alternating; digests must stay bit-identical
# through the r15 payload-match pinning + batch-sized exchanges), the
# full STREAMPROBE, the 50x headline decade (audio keep-list changed),
# and the 10x full ScaleProbe (carries the widened 50-query holdout rows).
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r15probes $(date +%H:%M:%S)] $*"; }

for rep in 0 1 2 3 4; do
  log "media A/B rep $rep"
  SPARK_GRAFT_AB_REP=$rep SPARK_GRAFT_PROBE_ONLY=media_ingest_heavy \
  SPARK_GRAFT_STREAMPROBE_OUT=/tmp/mediaab_r15_rep$rep.json \
  tools/runmain.sh graft.StreamScaleProbe 10 200 \
    > /tmp/mediaab_r15_rep$rep.log 2>&1 || log "rep $rep FAILED"
done
python3 tools/r15_assemble.py && log "MEDIA_AB_r15 assembled" \
  || log "ASSEMBLE FAILED (digest mismatch?)"

log "full STREAMPROBE"
tools/runmain.sh graft.StreamScaleProbe 10 200 \
  > /tmp/streamprobe_r15.log 2>&1 || log "STREAMPROBE FAILED"

log "ScaleProbe 50x headline"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r15_50x.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 50 headline \
  > /tmp/scaleprobe_r15_50x_final.log 2>&1 || log "50x FAILED"

log "ScaleProbe 10x full"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r15.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 10 > /tmp/scaleprobe_r15_10x.log 2>&1 \
  || log "10x FAILED"

log "ALL DONE"
