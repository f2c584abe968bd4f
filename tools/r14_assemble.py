#!/usr/bin/env python3
"""Assemble round-14 multi-run probe artifacts.

Reads the per-rep StreamScaleProbe outputs the r14_probes.sh driver wrote
to /tmp and emits:
  MEDIA_AB_r14.json  - five media_ingest_heavy A/B runs (arm order
                       alternating per rep), with per-arm index digests;
                       FAILS if any rep's arms disagree on any index
                       relation digest (the r14 gate-independence claim).
  STREAMPROBE_IJ_r14.json - five same-session interval_join runs + median
                       (VERDICT r13 #7: settle the 58k->38.7k swing).
Run from the repo root after tools/r14_probes.sh completes.
"""
import json, statistics, sys

# ---- media A/B --------------------------------------------------------
runs, digests = [], {}
for rep in range(5):
    d = json.load(open(f"/tmp/mediaab_r14_rep{rep}.json"))
    probes = {p["probe"]: p for p in d["probes"]}
    on, off = probes["media_ingest_heavy"], probes["media_ingest_heavy_nogate"]
    run = {"run": rep + 1,
           "arm_order": "gate_first" if rep % 2 == 0 else "control_first",
           "gate_on_sec": on["sec"], "gate_off_sec": off["sec"],
           "decode_calls_on": on["info"]["decode_calls"],
           "decode_calls_off": off["info"]["decode_calls"]}
    # Verdict-bearing relations only: payload/ is the pre-gate's own
    # working relation — the gate-off arm legitimately never writes it
    # (MediaIngest.processBatch appends it under `if (payloadGate)`).
    VERDICT_RELS = ("sig", "bands", "vframes")
    don = {k: on["info"]["index_digests"][k] for k in VERDICT_RELS}
    doff = {k: off["info"]["index_digests"][k] for k in VERDICT_RELS}
    run["index_digests_equal"] = don == doff
    run["index_digests"] = don
    if don != doff:
        run["digest_diff"] = {"on": don, "off": doff}
    digests[rep] = (don, doff)
    runs.append(run)

bad = [r for r in runs if not r["index_digests_equal"]]
ons = sorted(r["gate_on_sec"] for r in runs)
offs = sorted(r["gate_off_sec"] for r in runs)
med_on, med_off = statistics.median(ons), statistics.median(offs)
art = {
    "what": ("Round-14 rerun of the media_ingest_heavy payload pre-gate A/B "
             "(five same-session runs, arm order alternating per rep so "
             "monotone host drift cancels - ADVICE r13). The r14 claim under "
             "test: the pre-gate skips the codec but never pre-judges - "
             "payload-matched rows INHERIT their signature (within-batch "
             "canonical / sig+vframes index) and feed the SAME verdict "
             "relation, so the persisted verdict-bearing index relations "
             "(sig/bands/vframes) must be BIT-IDENTICAL across arms. Checked "
             "via order-independent xxhash64-XOR digests computed inside the "
             "probe and compared here. The payload/ relation is excluded: it "
             "is the pre-gate's own working set and the gate-off arm never "
             "writes it by construction."),
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
    "run_date": "2026-08-15, round-14 code",
}
json.dump(art, open("MEDIA_AB_r14.json", "w"), indent=1)
print(f"MEDIA_AB_r14.json: median {med_on}s vs {med_off}s "
      f"({med_off/med_on:.2f}x), digests equal: {not bad}")
if bad:
    print("DIGEST MISMATCH in runs:", [r["run"] for r in bad])
    sys.exit(1)

# ---- interval join ----------------------------------------------------
ij = []
for rep in range(1, 6):
    d = json.load(open(f"/tmp/ij_r14_rep{rep}.json"))
    p = [x for x in d["probes"] if x["probe"] == "interval_join"][0]
    ij.append({"run": rep, "sec": p["sec"], "rows_per_sec": p["rows_per_sec"],
               "input_rows": p["input_rows"], "output_rows": p["output_rows"]})
rps = sorted(x["rows_per_sec"] for x in ij)
art2 = {
    "what": ("VERDICT r13 #7: the committed interval_join row swung 58k (r9) "
             "-> 38.7k rows/s (r13) across rounds with contention notes each "
             "time. Five same-session runs on round-14 code settle whether "
             "the stream-stream join regressed or the host did."),
    "runs": ij,
    "summary": {"median_rows_per_sec": statistics.median(rps),
                "min_rows_per_sec": rps[0], "max_rows_per_sec": rps[-1]},
    "run_date": "2026-08-15, round-14 code",
}
json.dump(art2, open("STREAMPROBE_IJ_r14.json", "w"), indent=1)
print(f"STREAMPROBE_IJ_r14.json: median {statistics.median(rps):.0f} rows/s "
      f"(range {rps[0]:.0f}-{rps[-1]:.0f})")
