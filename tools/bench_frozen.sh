#!/bin/bash
# Cross-round-comparable sf1 bench on the FROZEN corpus (VERDICT r14 #4):
# verify the fixture digest, SfScale it 10x, bench, write BENCH_FROZEN.json.
#   tools/bench_frozen.sh [outJson]   (default BENCH_FROZEN.json)
set -uo pipefail
cd "$(dirname "$0")/.."
out="${1:-BENCH_FROZEN.json}"
log() { echo "[frozen $(date +%H:%M:%S)] $*"; }

log "digest check"
(cd fixtures/frozen-sf0.1 && sha256sum -c ../frozen-sf0.1.sha256 --quiet) \
  || { log "FIXTURE DIGEST MISMATCH — refusing to bench"; exit 1; }

if [ ! -f /tmp/frozen-sf1/_GRAFT_SFSCALE_DONE ]; then
  log "SfScale 10x fixtures -> /tmp/frozen-sf1"
  rm -rf /tmp/frozen-sf1
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
    tools/runmain.sh graft.SfScale fixtures/frozen-sf0.1 /tmp/frozen-sf1 10 \
    > /tmp/frozen_sfscale.log 2>&1 || { log "SfScale FAILED"; exit 1; }
  touch /tmp/frozen-sf1/_GRAFT_SFSCALE_DONE
fi

log "bench on frozen sf1"
# the committed artifact is the FILE graft.Bench writes (full query names,
# full precision — ADVICE r15), never the compact stdout line (abbreviated
# qNN keys, ms-rounded: a round-10 log-truncation workaround)
SPARK_GRAFT_SF_DIR=/tmp/frozen-sf1 SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_frozen_full.json \
  tools/runmain.sh graft.Bench > /tmp/bench_frozen.log 2>&1 \
  || { log "bench FAILED"; tail -5 /tmp/bench_frozen.log; exit 1; }

python3 - "$out" <<'EOF'
import json, sys, hashlib
d = json.load(open('/tmp/bench_frozen_full.json'))
d["corpus"] = "fixtures/frozen-sf0.1 (sha256-pinned) x10 via graft.SfScale"
d["fixture_digest"] = hashlib.sha256(
    open('fixtures/frozen-sf0.1.sha256','rb').read()).hexdigest()[:16]
json.dump(d, open(sys.argv[1], 'w'), indent=1)
print(f"wrote {sys.argv[1]}: {d['value']}s / {len(d.get('queries',{}))} queries")
EOF
log "ALL DONE"
