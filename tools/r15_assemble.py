#!/usr/bin/env python3
"""Assemble MEDIA_AB_r15.json from the five per-rep StreamScaleProbe runs
tools/r15_probes.sh wrote to /tmp (same gate as r14: arm order alternates
per rep; the verdict-bearing index relations sig/bands/vframes must be
bit-identical across arms in EVERY rep — the r15 payload-match pinning and
batch-sized exchanges are perf changes and must not move a single verdict).
"""
import json, statistics, sys

runs = []
for rep in range(5):
    d = json.load(open(f"/tmp/mediaab_r15_rep{rep}.json"))
    probes = {p["probe"]: p for p in d["probes"]}
    on, off = probes["media_ingest_heavy"], probes["media_ingest_heavy_nogate"]
    run = {"run": rep + 1,
           "arm_order": "gate_first" if rep % 2 == 0 else "control_first",
           "gate_on_sec": on["sec"], "gate_off_sec": off["sec"],
           "decode_calls_on": on["info"]["decode_calls"],
           "decode_calls_off": off["info"]["decode_calls"]}
    VERDICT_RELS = ("sig", "bands", "vframes")
    don = {k: on["info"]["index_digests"][k] for k in VERDICT_RELS}
    doff = {k: off["info"]["index_digests"][k] for k in VERDICT_RELS}
    run["index_digests_equal"] = don == doff
    run["index_digests"] = don
    if don != doff:
        run["digest_diff"] = {"on": don, "off": doff}
    runs.append(run)

bad = [r for r in runs if not r["index_digests_equal"]]
ons = sorted(r["gate_on_sec"] for r in runs)
offs = sorted(r["gate_off_sec"] for r in runs)
med_on, med_off = statistics.median(ons), statistics.median(offs)
art = {
    "what": ("Round-15 rerun of the media_ingest_heavy payload pre-gate A/B "
             "(five same-session runs, arm order alternating per rep). The "
             "r15 changes under test: the payload-match relation is computed "
             "once and pinned (inheritance joins gated on the observed "
             "per-kind match counts), the `exact` verdict subplan is pinned, "
             "and per-batch exchanges are sized to the batch volume with the "
             "decode chains carved out at session parallelism. All are perf "
             "moves: the verdict-bearing index relations (sig/bands/vframes) "
             "must stay BIT-IDENTICAL across arms, checked via the probe's "
             "order-independent xxhash64-XOR digests. payload/ excluded: the "
             "gate-off arm never writes it by construction."),
    "runs": runs,
    "summary": {
        "median_on_sec": med_on, "median_off_sec": med_off,
        "median_ratio": round(med_off / med_on, 2),
        "worst_case_pairing_ratio": round(offs[0] / ons[-1], 2),
        "decode_calls": {"on": runs[0]["decode_calls_on"],
                         "off": runs[0]["decode_calls_off"],
                         "ratio": round(runs[0]["decode_calls_off"] /
                                        runs[0]["decode_calls_on"], 2)},
        "index_digests_equal_all_runs": not bad,
    },
    "run_date": "2026-08-16, round-15 code",
}
json.dump(art, open("MEDIA_AB_r15.json", "w"), indent=1)
print(f"MEDIA_AB_r15.json: median {med_on}s vs {med_off}s "
      f"({med_off/med_on:.2f}x), digests equal: {not bad}")
if bad:
    print("DIGEST MISMATCH in runs:", [r["run"] for r in bad])
    sys.exit(1)
