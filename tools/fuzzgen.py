#!/usr/bin/env python3
"""Adversarial testdata generator for the cross-engine oracle harness.

Writes a full table set with the exact driver schemas but HOSTILE content —
nulls in every nullable column, empty/whitespace-only/unicode/huge-repeat
texts, duplicate keys, boundary timestamps — then the normal flow applies:

    python3 tools/fuzzgen.py /tmp/graft-fuzz [seed]
    sbt "runMain graft.Verify /tmp/graft-fuzz /tmp/verify_fuzz"
    python3 tools/compare.py /tmp/graft-fuzz /tmp/verify_fuzz

Anything the clean driver data never exercises (null-text token stats,
unicode lowercasing, empty-string tokens, tie-heavy groups, equal
timestamps, zero and exactly-duplicated vectors) gets a cross-engine
check here. Nulls live in the events/documents/customer columns the
reference pipeline validates; TPC-H measure columns stay non-null.
Excluded on purpose: NaN/Inf doubles (both engines order NaN last in
ORDER BY but aggregate paths differ; the driver corpus has none) and
null join keys in TPC-H tables (equi-joins drop them identically, so
they only reduce coverage).
"""
import sys
import random
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-fuzz"
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1337
rnd = random.Random(seed)
import os
if out.startswith("/root/testdata"):
    sys.exit(f"refusing to overwrite the driver corpus at {out}")
if os.path.isdir(out) and any(f.endswith(".parquet") for f in os.listdir(out)):
    sys.exit(f"refusing to overwrite existing parquet tables in {out} — "
             "pass a fresh output dir")
os.makedirs(out, exist_ok=True)


def write(name, schema, cols):
    pq.write_table(pa.table(cols, schema=schema), f"{out}/{name}.parquet")


# ---------------------------------------------------------------- TPC-H-ish
REGIONS = ["AMERICA", "ASIA", "EUROPE", "AFRICA", "MIDDLE EAST"]
write("region",
      pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
      {"r_regionkey": list(range(5)), "r_name": REGIONS})

N_NATION = 12
write("nation",
      pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                 ("n_regionkey", pa.int32())]),
      {"n_nationkey": list(range(N_NATION)),
       "n_name": [f"NATION_{i}" for i in range(N_NATION)],
       "n_regionkey": [i % 5 for i in range(N_NATION)]})

N_CUST = 200
write("customer",
      pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                 ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                 ("c_mktsegment", pa.string())]),
      {"c_custkey": list(range(1, N_CUST + 1)),
       "c_name": [f"Customer#{i}" if i % 7 else None for i in range(1, N_CUST + 1)],
       "c_nationkey": [rnd.randrange(N_NATION) for _ in range(N_CUST)],
       "c_acctbal": [round(rnd.uniform(-999, 9999), 2) if i % 11 else None
                     for i in range(N_CUST)],
       "c_mktsegment": [rnd.choice(["BUILDING", "MACHINERY", None]) for _ in range(N_CUST)]})

N_SUPP = 40
write("supplier",
      pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                 ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]),
      {"s_suppkey": list(range(1, N_SUPP + 1)),
       "s_name": [f"Supplier#{i}" for i in range(1, N_SUPP + 1)],
       "s_nationkey": [rnd.randrange(N_NATION) for _ in range(N_SUPP)],
       "s_acctbal": [round(rnd.uniform(-999, 9999), 2) for _ in range(N_SUPP)]})

N_PART = 100
write("part",
      pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                 ("p_brand", pa.string()), ("p_type", pa.string()),
                 ("p_size", pa.int32()), ("p_retailprice", pa.float64())]),
      {"p_partkey": list(range(1, N_PART + 1)),
       "p_name": [f"part {i}" for i in range(1, N_PART + 1)],
       "p_brand": [f"Brand#{i % 5}" for i in range(N_PART)],
       # ties on purpose: few distinct types → grouped aggs have big groups
       "p_type": [rnd.choice(["ECONOMY", "STANDARD", "PROMO"]) for _ in range(N_PART)],
       "p_size": [rnd.randrange(1, 50) for _ in range(N_PART)],
       "p_retailprice": [round(rnd.uniform(1, 2000), 2) for _ in range(N_PART)]})

N_ORD = 500


def ms(y, m, d):
    import datetime
    return datetime.datetime(y, m, d)


write("orders",
      pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                 ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                 ("o_orderdate", pa.timestamp("ms")), ("o_orderpriority", pa.string())]),
      {"o_orderkey": list(range(1, N_ORD + 1)),
       "o_custkey": [rnd.randrange(1, N_CUST + 1) for _ in range(N_ORD)],
       "o_orderstatus": [rnd.choice(["O", "F", "P"]) for _ in range(N_ORD)],
       "o_totalprice": [round(rnd.uniform(1, 400000), 2) for _ in range(N_ORD)],
       "o_orderdate": [ms(rnd.randrange(1992, 1999), rnd.randrange(1, 13),
                          rnd.randrange(1, 29)) for _ in range(N_ORD)],
       "o_orderpriority": [rnd.choice(["1-URGENT", "3-MEDIUM", "5-LOW"]) for _ in range(N_ORD)]})

N_LI = 2000
write("lineitem",
      pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                 ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                 ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                 ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                 ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                 ("l_shipdate", pa.timestamp("ms"))]),
      {"l_orderkey": [rnd.randrange(1, N_ORD + 1) for _ in range(N_LI)],
       "l_partkey": [rnd.randrange(1, N_PART + 1) for _ in range(N_LI)],
       "l_suppkey": [rnd.randrange(1, N_SUPP + 1) for _ in range(N_LI)],
       "l_linenumber": [i % 7 + 1 for i in range(N_LI)],
       # 2-decimal money family: the Deterministic decimal-sum contract
       "l_quantity": [float(rnd.randrange(1, 51)) for _ in range(N_LI)],
       "l_extendedprice": [round(rnd.uniform(1, 100000), 2) for _ in range(N_LI)],
       "l_discount": [round(rnd.uniform(0, 0.1), 2) for _ in range(N_LI)],
       "l_tax": [round(rnd.uniform(0, 0.08), 2) for _ in range(N_LI)],
       "l_returnflag": [rnd.choice(["A", "N", "R"]) for _ in range(N_LI)],
       "l_linestatus": [rnd.choice(["O", "F"]) for _ in range(N_LI)],
       "l_shipdate": [ms(rnd.randrange(1992, 1999), rnd.randrange(1, 13),
                         rnd.randrange(1, 29)) for _ in range(N_LI)]})

# ------------------------------------------------------------------- events
N_EV = 3000
BASE_NS = 1704067200_000_000_000  # 2024-01-01 UTC
event_ids = list(range(1, N_EV + 1))
# duplicate event ids on purpose (dedup queries must tie-break)
for i in range(0, N_EV, 97):
    event_ids[i] = event_ids[i - 1] if i else 1
write("events",
      pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
                 ("user_id", pa.int64()), ("event_type", pa.string()),
                 ("value", pa.float64()), ("props", pa.string())]),
      {"event_id": event_ids,
       # sub-millisecond nanos exercise the nanos→micros truncation;
       # i%3∈{0,1} within one i//2 group share the EXACT same ts, so
       # ordering/window tie-breaks on equal timestamps are really hit
       "ts": [BASE_NS + (i // 2) * 61_000_000_000 +
              (123_456_789 if i % 3 == 2 else 0)
              for i in range(N_EV)],
       "user_id": [rnd.randrange(1, 60) if i % 5 else None for i in range(N_EV)],
       "event_type": [rnd.choice(["view", "click", "purchase", "signup", "error",
                                  " VIEW ", "Purchase", None]) for _ in range(N_EV)],
       "value": [round(rnd.uniform(-10, 500), 2) if i % 13 else None for i in range(N_EV)],
       "props": [rnd.choice(['{"k": 2}', '{"k": 0}', '{}', '{"k": -1}', None,
                             'not json', '{"k": 999}']) for _ in range(N_EV)]})

# ---------------------------------------------------------------- documents
TEXTS = [
    None, "", " ", "\t\n  ", "single",
    "ÜBER die Straße läuft ein FUCHS über die straße",   # unicode + case
    "naïve café résumé — em-dash…and ellipsis",
    "日本語のテキストとspaces混在 mixed tokens",
    "the the the the the the the the the the",            # degenerate repeat
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "Exact duplicate text body.", "Exact duplicate text body.",
    "tabs\tbetween\ttokens and  double  spaces",
    # vertical tab: Java \s includes \x0B, RE2 \s does not — engines must
    # agree because the oracles spell the whitespace class out explicitly
    "vertical\x0Btab splits words here too ok",
    "\x0B\x0B leading vtab run\x0B trailing \x0B",
    "ALLCAPS SHOUTING TEXT WITH NUMBERS 123 456 789",
    "x" * 5000,                                           # one huge token
    ("repeat me " * 400).strip(),                          # long repetitive
]
N_DOC = 300
texts, langs, sources = [], [], []
for i in range(N_DOC):
    if i < len(TEXTS):
        texts.append(TEXTS[i])
    else:
        words = [rnd.choice(["alpha", "beta", "gamma", "delta", "the", "und",
                             "de", "le", "él", "naïve", "123", "-", "…"])
                 for _ in range(rnd.randrange(0, 40))]
        texts.append(" ".join(words) if words else "")
    # ~2% NULL lang (ADVICE r17: the schema allows it but no generator
    # emitted it, so the K-class labeler's null-label path — and every
    # other lang grouping — had zero cross-engine coverage)
    langs.append(None if i % 47 == 11
                 else rnd.choice(["en", "de", "es", "fr", "zh"]))
    sources.append(f"src{rnd.randrange(6)}")
write("documents",
      pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]),
      {"doc_id": list(range(1, N_DOC + 1)),
       "text": texts,
       "lang": langs,
       "source": sources,
       "n_chars": [len(t) if t is not None else 0 for t in texts]})

# --------------------------------------------------------------- embeddings
N_VEC = 400
DIM = 64
embs = []
for i in range(N_VEC):
    if i % 50 == 0:
        embs.append([0.0] * DIM)                   # zero vector (norm edge)
    elif i % 50 == 2 and i > 2:
        # exact duplicate of the PREVIOUS NORMAL vector (i%50==1), not the
        # zero vector — cosine==1.0 pairs must reach the near-dup/keep-list
        # paths that norm guards would otherwise exclude
        embs.append(list(embs[-1]))
    else:
        embs.append([round(rnd.uniform(-1, 1), 6) for _ in range(DIM)])
write("embeddings",
      pa.schema([("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float32())),
                 ("label", pa.int32())]),
      {"vec_id": list(range(1, N_VEC + 1)),
       "embedding": embs,
       "label": [rnd.randrange(8) for _ in range(N_VEC)]})

print(f"wrote fuzz tables to {out} (seed={seed})")
