#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF1.json from a compare.py run.

Usage: python3 tools/sf1_record.py <sfDir> <verifyOutDir> <skipList> <benchNote> <outJson>

Runs compare.py with --skip <skipList>, parses its per-query lines, adds
row counts from the Spark parquet dumps, and writes the committed artifact.
"""
import json, subprocess, sys, os, glob

import duckdb

sfdir, outdir, skiplist, bench_note, out_json = sys.argv[1:6]

proc = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "compare.py"),
     sfdir, outdir, "--skip", skiplist],
    capture_output=True, text=True)
print(proc.stdout)
if proc.stderr:
    print(proc.stderr, file=sys.stderr)

con = duckdb.connect()
def rows_of(name):
    try:
        return con.execute(
            f"SELECT COUNT(*) FROM parquet_scan('{outdir}/{name}/*.parquet')"
        ).fetchone()[0]
    except Exception:
        return None

record = {}
ok = fails = 0
for line in proc.stdout.splitlines():
    parts = line.split()
    if not parts or parts[0] not in ("OK", "FAIL", "SKIP"):
        continue
    name = parts[1].rstrip(":")
    if parts[0] == "OK":
        record[name] = {"oracle": "ok", "rows": rows_of(name)}
        ok += 1
    elif parts[0] == "SKIP":
        record[name] = {"oracle": "skip", "rows": rows_of(name),
                        "note": "oracle intractable in single-node DuckDB at this volume"}
    else:
        record[name] = {"oracle": "FAIL", "rows": rows_of(name),
                        "detail": line[len("FAIL "):][:300]}
        fails += 1

# A compare.py crash (import error, bad path, traceback before any
# per-query line) must NOT produce a green '0 oracles OK, 0 failures'
# artifact that checked nothing: fail loudly when no OK/FAIL/SKIP line was
# parsed, and when compare exited nonzero without any FAIL line explaining
# it (compare exits 1 on real per-query failures — those are recorded below
# and reflected in this script's own exit code).
if not record:
    print("FATAL: zero OK/FAIL/SKIP lines parsed from compare.py output "
          "— the comparison ran nothing", file=sys.stderr)
    sys.exit(1)
if proc.returncode != 0 and fails == 0:
    print(f"FATAL: compare.py exited {proc.returncode} with no FAIL lines "
          "— it crashed after partial output", file=sys.stderr)
    sys.exit(1)

# queries Verify ran but compare has no oracle entry for (q35)
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
for d in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(d)
    if not os.path.isdir(d) or name in record:
        continue
    record[name] = {"oracle": "no_oracle", "rows": rows_of(name)}
errs_path = f"{outdir}/errors.json"
if os.path.exists(errs_path):
    for name, msg in json.load(open(errs_path)).items():
        record[name] = {"oracle": "SPARK_FAIL", "rows": None, "detail": msg[:300]}
        fails += 1

meta = {
    "sf": "sf1 (6M lineitem / 1M events / 50k documents / 20k embeddings)",
    "data": "deterministic FK-consistent 10x scale of driver sf0.1 via graft.SfScale (regenerated on current testdata)",
    "summary": f"{ok} oracles OK, {fails} failures, "
               f"{sum(1 for v in record.values() if v['oracle'] == 'skip')} skipped "
               f"(quadratic all-pairs oracles intractable in DuckDB at this volume), "
               f"q35 no-oracle by design",
    "bench": bench_note,
}
out = {"_meta": meta}
for name in sorted(record):
    out[name] = record[name]
json.dump(out, open(out_json, "w"), indent=1)
print(f"wrote {out_json}: {ok} ok, {fails} fail")
sys.exit(1 if fails else 0)
