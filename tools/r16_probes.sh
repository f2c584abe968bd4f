#!/bin/bash
# Round-16 probe refresh, serial (host-noise policy: one timing-sensitive
# run at a time): media A/B x5 on the restructured MediaIngest (per-kind
# fetch pinning + audio branch — digests must stay bit-identical), the
# derivation-family variance profile (q36/q121 5-rep medians, VERDICT r15
# #4), the 50x headline decade and the 10x full ScaleProbe (carry the
# corpus-scaled PQ floor holdout rows).
# The full STREAMPROBE (with the new media_ingest_audio probe and the
# crawl-loop stage attribution) runs separately first — see the round log.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r16probes $(date +%H:%M:%S)] $*"; }

for rep in 0 1 2 3 4; do
  log "media A/B rep $rep"
  SPARK_GRAFT_AB_REP=$rep SPARK_GRAFT_PROBE_ONLY=media_ingest_heavy \
  SPARK_GRAFT_STREAMPROBE_OUT=/tmp/mediaab_r16_rep$rep.json \
  tools/runmain.sh graft.StreamScaleProbe 10 200 \
    > /tmp/mediaab_r16_rep$rep.log 2>&1 || log "rep $rep FAILED"
done
python3 tools/r16_assemble.py && log "MEDIA_AB_r16 assembled" \
  || log "ASSEMBLE FAILED (digest mismatch?)"

log "DerivProf q36/q121 medians (sf0.1, 5 reps)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/runmain.sh graft.DerivProf /root/testdata/sf0.1 5 \
  > /tmp/derivprof_r16.log 2>&1 || log "DerivProf FAILED"
grep '^{' /tmp/derivprof_r16.log | tail -1 | python3 -m json.tool \
  > DERIVPROF_r16.json && log "DERIVPROF_r16 written"

log "ScaleProbe 50x headline"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r16_50x.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 50 headline \
  > /tmp/scaleprobe_r16_50x.log 2>&1 || log "50x FAILED"

log "ScaleProbe 10x full"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r16.json SPARK_DRIVER_MEM=24g \
  tools/runmain.sh graft.ScaleProbe 10 > /tmp/scaleprobe_r16_10x.log 2>&1 \
  || log "10x FAILED"

log "ALL DONE"
