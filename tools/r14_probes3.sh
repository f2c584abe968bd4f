#!/bin/bash
# Round-14 final media evidence: re-run the media probes on the committed
# round-14 code (which added the exact-match band-probe skip after the
# first A/B round), then a full STREAMPROBE refresh so the committed
# artifact reflects final code. Serial.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r14probes3 $(date +%H:%M:%S)] $*"; }

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

log "ALL DONE"
