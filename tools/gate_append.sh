#!/bin/bash
# Append one gate result line to the round's committed gate record and
# commit it immediately (VERDICT r16 #1: every r16 gate passed but the
# results lived in /tmp and the driver's own record came out empty — the
# record must be commit-proof AS the chain runs, not assembled after it).
#
# Usage: tools/gate_append.sh <GATES_file> <gate-name> <result-text...>
# The file is JSON-lines: {"ts": ..., "gate": ..., "result": ...}
set -euo pipefail
cd "$(dirname "$0")/.."
FILE="$1"; GATE="$2"; shift 2
RESULT="$*"
python3 - "$FILE" "$GATE" "$RESULT" <<'EOF'
import json, sys, datetime
f, gate, result = sys.argv[1], sys.argv[2], sys.argv[3]
line = json.dumps({
    "ts": datetime.datetime.now().astimezone().isoformat(timespec="seconds"),
    "gate": gate, "result": result})
with open(f, "a") as fh:
    fh.write(line + "\n")
print(line)
EOF
git add "$FILE"
git commit -q -m "Gate record: $GATE" -- "$FILE" || true
