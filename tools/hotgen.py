#!/usr/bin/env python3
"""Hot-shingle corpus generator (the companion to tools/fuzzgen.py, which
covers nulls/unicode/boundaries — this one covers DEGENERATE KEY
DISTRIBUTIONS).

Builds a copy of a testdata scale dir whose documents table has a planted
hot-shingle distribution — the corpora the budgeted/capped near-dup paths
(q24 hub budget, q38/q77 df cap) exist for:

  - 200 near-identical boilerplate docs (one hot LSH bucket per band and
    hot 3-gram posting lists),
  - 100 exact clones of a second template (exact-dedup pressure),
  - a random-tail of normal documents.

Usage:
    python3 tools/hotgen.py /root/testdata/sf0.01 /tmp/fuzzsf
    sbt "runMain graft.Verify /tmp/fuzzsf /tmp/verify_fuzz"
    python3 tools/compare.py /tmp/fuzzsf /tmp/verify_fuzz

Every oracle mirrors its query's pruning/budget heuristics verbatim, so
the full suite must stay hash-green on this corpus too (round 5: 83/83).
"""
import shutil
import sys
import random

import pyarrow as pa
import pyarrow.parquet as pq


def main(src: str, dst: str, seed: int = 7) -> None:
    random.seed(seed)
    shutil.copytree(src, dst, dirs_exist_ok=True)
    rows = []
    boiler = " ".join(f"w{i}" for i in range(40))
    for i in range(200):
        txt = boiler + (f" extra{i % 5}" if i % 4 else "")
        rows.append((i, txt, "en", "boiler", len(txt)))
    tmpl = " ".join(f"t{i}" for i in range(35))
    for i in range(200, 300):
        rows.append((i, tmpl, "de", "clone", len(tmpl)))
    for i in range(300, 800):
        txt = " ".join(
            f"r{random.randint(0, 5000)}"
            for _ in range(random.randint(5, 60)))
        rows.append((i, txt,
                     random.choice(["en", "de", "es", "fr", "zh"]),
                     random.choice(["webA", "webB", "webC"]), len(txt)))
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(table, f"{dst}/documents.parquet")
    print(f"wrote {table.num_rows} hostile docs to {dst}/documents.parquet")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
