#!/bin/bash
# Round-14 evidence runs, serial (one Spark JVM at a time so the timing
# runs don't contend with each other — the whole point of the multi-run
# medians). Logs to /tmp/r14_probes.log; artifacts land in /tmp and cwd.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r14probes $(date +%H:%M:%S)] $*"; }

# 1) media_ingest_heavy A/B x5 with arm alternation (VERDICT r13 #4 proof:
#    index digests bit-identical across arms on r14 code)
for rep in 0 1 2 3 4; do
  log "media A/B rep $rep"
  SPARK_GRAFT_AB_REP=$rep SPARK_GRAFT_PROBE_ONLY=media_ingest_heavy \
  SPARK_GRAFT_STREAMPROBE_OUT=/tmp/mediaab_r14_rep$rep.json \
  tools/runmain.sh graft.StreamScaleProbe 10 200 \
    > /tmp/mediaab_r14_rep$rep.log 2>&1 || log "rep $rep FAILED"
done

# 2) interval_join x5 (VERDICT r13 #7: settle the 58k->38.7k swing with a
#    same-session multi-run median)
for rep in 1 2 3 4 5; do
  log "interval_join rep $rep"
  SPARK_GRAFT_PROBE_ONLY=interval_join \
  SPARK_GRAFT_STREAMPROBE_OUT=/tmp/ij_r14_rep$rep.json \
  tools/runmain.sh graft.StreamScaleProbe 10 200 \
    > /tmp/ij_r14_rep$rep.log 2>&1 || log "rep $rep FAILED"
done

# 3) full streaming probe refresh on round-14 code -> committed artifact
log "full STREAMPROBE"
tools/runmain.sh graft.StreamScaleProbe 10 200 \
  > /tmp/streamprobe_r14.log 2>&1 || log "STREAMPROBE FAILED"

# 4) scale decades with the derived-nprobe serving default (VERDICT #1 tail)
log "ScaleProbe 10x"
SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r14.json SPARK_DRIVER_MEM=16g \
  tools/runmain.sh graft.ScaleProbe 10 > /tmp/scaleprobe_r14_10x.log 2>&1 \
  || log "10x FAILED"
for m in 50 100 200; do
  log "ScaleProbe ${m}x"
  SPARK_GRAFT_SCALEPROBE_OUT=SCALEPROBE_r14_${m}x.json SPARK_DRIVER_MEM=24g \
    tools/runmain.sh graft.ScaleProbe $m > /tmp/scaleprobe_r14_${m}x.log 2>&1 \
    || log "${m}x FAILED"
done

# 5) bench at sf0.1 on final code
log "bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=16g \
  tools/runmain.sh graft.Bench > /tmp/bench_r14.log 2>&1 || log "bench FAILED"

log "ALL DONE"
