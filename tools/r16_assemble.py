#!/usr/bin/env python3
"""Assemble MEDIA_AB_r16.json from the five per-rep StreamScaleProbe runs
tools/r16_probes.sh wrote to /tmp (the r14/r15 gate: arm order alternates
per rep; the verdict-bearing index relations must be bit-identical across
arms in EVERY rep). r16 widens the relation set to the audio index
(asig/abands — empty for the image-weight stream, so their digests are a
schema-presence check here; the populated-audio A/B equivalence is the
MediaIngestSpec audio A/B test) and the changes under test are the r16
MediaIngest restructure: the per-kind signature FETCH is pinned instead of
the probe-side union (the orphaned-payload decode fallback), audio joins
the examined kinds, and the passthrough filler rows moved to kind 'text'.
All are routing-neutral for this stream: digests must not move.
"""
import json, statistics, sys

runs = []
for rep in range(5):
    d = json.load(open(f"/tmp/mediaab_r16_rep{rep}.json"))
    probes = {p["probe"]: p for p in d["probes"]}
    on, off = probes["media_ingest_heavy"], probes["media_ingest_heavy_nogate"]
    run = {"run": rep + 1,
           "arm_order": "gate_first" if rep % 2 == 0 else "control_first",
           "gate_on_sec": on["sec"], "gate_off_sec": off["sec"],
           "decode_calls_on": on["info"]["decode_calls"],
           "decode_calls_off": off["info"]["decode_calls"]}
    VERDICT_RELS = ("sig", "bands", "vframes", "asig", "abands")
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
    "what": ("Round-16 rerun of the media_ingest_heavy payload pre-gate A/B "
             "(five same-session runs, arm order alternating per rep). The "
             "r16 changes under test: the per-kind signature fetch is pinned "
             "instead of the r15 probe-side union, so an index-known row "
             "whose sig/vframes/asig fetch misses falls back to decode "
             "(ADVICE r15) - a plan restructure that must not move a single "
             "verdict; audio is now an examined kind (empty in this stream); "
             "digest set widened to the audio relations."),
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
    "run_date": "2026-08-16, round-16 code",
}
json.dump(art, open("MEDIA_AB_r16.json", "w"), indent=1)
print(f"MEDIA_AB_r16.json: median {med_on}s vs {med_off}s "
      f"({med_off/med_on:.2f}x), digests equal: {not bad}")
sys.exit(1 if bad else 0)
