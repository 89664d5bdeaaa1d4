#!/usr/bin/env python3
"""Native scale-factor generator (dev tool — NOT shipped library code).

The driver's testdata tops out at sf0.1 and the K-fold replica
(scale_up.py) deliberately K^2-stresses pair families while
UNDER-stressing distinct-cardinality growth (keys shift, but digests /
vocab / vector space replicate instead of growing). This generator
builds a NATIVE larger SF with the same schema contract (TESTDATA.md),
the same column distributions (measured from the driver's sf0.1), and
genuinely grown domains: new customers/users/parts, fresh document
texts over a vocabulary that grows Heaps-style with the corpus, fresh
clustered vectors. Correctness replay stays exact because the DuckDB
oracle reads the same generated files.

Usage: python3 tools/gen_sf.py <dstDir> <sf>     (e.g.  ... /tmp/sf1 1.0)

Deterministic for a fixed (sf, seed): numpy PCG64 with seed 4242.

Structural signals the queries need, mirrored from the driver data:
 - documents: ~0.2% exact duplicates + ~1.5% near-duplicates
   (perturbed copies of earlier docs) concentrated at the tail of the
   id range; 20 uniform sources; lang labels (en-heavy) independent of
   the shared vocabulary (the lang-ID confusion panel measures exactly
   that gap); token counts give 44..~600 char texts.
 - embeddings: 10 gaussian clusters (label = cluster), components
   roughly in [-0.4, 0.4]; contiguous vec_id from 0 (probe set is
   vec_id < NumQueries).
 - events: 30 days of uniform timestamps from 2024-01-01, 5 uniform
   event types, gamma-ish value (mean ~50), props = {"k": 0..99},
   users ~ 15k x sf.
 - TPC-H-ish tables: the measured ranges/frequencies of sf0.1
   (statuses, priorities, flags, price/quantity/discount/tax ranges,
   1995..2001 date windows, shipdate = orderdate + 1..95 days).
"""
import hashlib
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

dst, sf = sys.argv[1], float(sys.argv[2])
os.makedirs(dst, exist_ok=True)
rng = np.random.default_rng(4242)

N_CUST = int(150000 * sf)
N_SUPP = int(10000 * sf)
N_PART = int(200000 * sf)
N_ORD = int(1500000 * sf)
N_EV = int(1000000 * sf)
N_USERS = int(15000 * sf)
N_DOC = int(50000 * sf)
N_VEC = int(20000 * sf)

DAY_US = 86400000000


def write(name, cols):
    pq.write_table(pa.table(cols), f"{dst}/{name}.parquet")
    print(name, "rows:", len(next(iter(cols.values()))))


# ---- dimensions (verbatim contract: 5 regions, 25 nations) ------------
write("region", {
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]})
write("nation", {
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})

# ---- customer / supplier / part ---------------------------------------
write("customer", {
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(
        ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    )[rng.integers(0, 5, N_CUST)]})
write("supplier", {
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)})
ADJ = ["large", "small", "hot", "cold", "blue", "red", "green", "shiny",
       "plated", "brushed"]
NOUN = ["ring", "bolt", "washer", "screw", "gear", "cog", "pin", "rod",
        "plate", "valve"]
write("part", {
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{ADJ[int(a)]} {NOUN[int(b)]}" for a, b in zip(
        rng.integers(0, 10, N_PART), rng.integers(0, 10, N_PART))],
    "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
        rng.integers(0, 25, N_PART)],
    "p_type": np.array(["ECONOMY", "LARGE", "STANDARD", "SMALL", "MEDIUM",
                        "PROMO"])[rng.integers(0, 6, N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32())})

# ---- orders / lineitem ------------------------------------------------
o_date_us = (rng.integers(0, 2404, N_ORD) * DAY_US +
             np.int64(788918400000000))  # 1995-01-01 .. 2001-08-01
write("orders", {
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(o_date_us, pa.timestamp("us")),
    "o_orderpriority": np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORD)]})
n_items = rng.integers(1, 8, N_ORD)  # 1..7 lines, mean 4 -> ~4x orders
li_order = np.repeat(np.arange(N_ORD, dtype=np.int64), n_items)
N_LI = len(li_order)
li_linenumber = np.concatenate([np.arange(1, k + 1) for k in n_items])
li_ship_us = (o_date_us[li_order] +
              rng.integers(1, 96, N_LI) * DAY_US)
write("lineitem", {
    "l_orderkey": pa.array(li_order, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(li_linenumber, pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LI) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LI) / 100.0, 2),
    "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)],
    "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, N_LI)],
    "l_shipdate": pa.array(li_ship_us, pa.timestamp("us"))})

# ---- events -----------------------------------------------------------
ev_ts_us = (np.int64(1704067200000000) +  # 2024-01-01
            rng.integers(0, 30 * DAY_US, N_EV))
write("events", {
    "event_id": pa.array(range(N_EV), pa.int64()),
    "ts": pa.array(ev_ts_us, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EV), pa.int64()),
    "event_type": np.array(["view", "click", "purchase", "signup",
                            "error"])[rng.integers(0, 5, N_EV)],
    "value": np.round(rng.gamma(2.0, 25.0, N_EV), 2),
    "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N_EV)]})

# ---- documents --------------------------------------------------------
# Wide enough core vocabulary + long enough docs that CHANCE shingle
# overlap can't create near-dup pairs: with a tiny vocab and 8-token
# docs, a 50k corpus percolates into giant jaccard-0.5 components that
# no real web corpus has (and that blow up any transitive-closure
# oracle quadratically). Engineered dups below remain the only real
# near-dup signal.
CORE = ("spark column row line query big fast data stream window table "
        "order customer part vector small merge value batch sort hash "
        "scan group agg filter key slow a the of and to in is "
        "plan stage task node disk memory cache spill core shuffle "
        "broadcast join scanrate page block footer codec schema field "
        "type null string double float int long array map struct list "
        "read write append commit marker atomic retry batchid offset "
        "topic queue log segment index seek flush sync close open "
        "token text corpus dedup shingle band bucket signature digest "
        "cluster center metric cosine norm encode decode label model "
        "train eval split gate score weight sample pack shard epoch "
        "source mix ratio share count total mean exact rational unit "
        "micro lift fold left right ascend descend tie break canon "
        "grain span chunk passage window2 gap session user event hour "
        "day week burst drift alarm panel report card audit health").split()
# Heaps-style growing tail vocabulary: zipfian draws over a pool that
# scales with the corpus — distinct-token growth is native, not capped
TAIL_POOL = max(1000, N_DOC // 5)
tail_words = np.array([f"w{i}" for i in range(TAIL_POOL)])
zipf_w = 1.0 / np.arange(1, TAIL_POOL + 1)
zipf_p = zipf_w / zipf_w.sum()
langs = np.array(["en", "de", "es", "fr", "zh"])[
    rng.choice(5, N_DOC, p=[0.41, 0.14, 0.15, 0.15, 0.15])]
doc_len = rng.integers(30, 150, N_DOC)
texts = []
for i in range(N_DOC):
    n = int(doc_len[i])
    core = rng.choice(CORE, n)
    tail = tail_words[rng.choice(TAIL_POOL, max(1, n // 8), p=zipf_p)]
    toks = np.concatenate([core, tail])
    rng.shuffle(toks)
    texts.append(" ".join(toks))
# engineered duplicate structure at the tail of the id range
n_exact = max(2, N_DOC // 500)
n_near = max(4, (3 * N_DOC) // 200)
for i in range(N_DOC - n_exact, N_DOC):
    texts[i] = texts[int(rng.integers(0, N_DOC // 2))]
for i in range(N_DOC - n_exact - n_near, N_DOC - n_exact):
    src_toks = texts[int(rng.integers(0, N_DOC // 2))].split()
    toks = list(src_toks)
    for _ in range(max(1, len(toks) // 10)):
        toks[int(rng.integers(0, len(toks)))] = str(
            rng.choice(CORE))
    texts[i] = " ".join(toks)
write("documents", {
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "source": np.array([f"src{i}" for i in range(20)])[
        rng.integers(0, 20, N_DOC)],
    "lang": langs,
    "text": texts,
    "n_chars": pa.array([len(t) for t in texts], pa.int64())})

# ---- chance-near-dup probe (fails loudly) -----------------------------
# Guards the vocabulary/length distribution above: if CHANCE shingle
# overlap among NON-engineered docs can reach near-dup thresholds, the
# corpus percolates into giant jaccard components that (a) no real web
# corpus has and (b) make any transitive-closure oracle quadratic.
# MinHash estimate over a sample; own RNG so the main stream (and thus
# every table for a fixed seed) is untouched by probe-size changes.
prng = np.random.default_rng(99)
n_eng = n_exact + n_near
sample = prng.choice(N_DOC - n_eng, min(2000, N_DOC - n_eng),
                     replace=False)
P = np.uint64((1 << 61) - 1)
ha = prng.integers(1, P, 32, dtype=np.uint64)
hb = prng.integers(0, P, 32, dtype=np.uint64)
sigs = np.empty((len(sample), 32), dtype=np.uint64)
def _shingle_hash(s):
    # deterministic across processes: builtin hash() is salted by
    # PYTHONHASHSEED and would make the probe gate flicker run-to-run
    d = hashlib.blake2b(s.encode(), digest_size=8, key=b"probe").digest()
    return int.from_bytes(d, "little") & 0x7FFFFFFFFFFFFFFF
for si, di in enumerate(sample):
    t = texts[di].split()
    sh = np.array([_shingle_hash(" ".join(t[j:j + 3]))
                   for j in range(len(t) - 2)], dtype=np.uint64)
    sigs[si] = ((sh[:, None] * ha + hb) % P).min(axis=0)
bad = 0
for i0 in range(0, len(sample), 256):
    blk = sigs[i0:i0 + 256]
    eq = (blk[:, None, :] == sigs[None, :, :]).sum(axis=2)
    for bi, gi in np.argwhere(eq >= 16):          # est jaccard >= 0.5
        if i0 + bi < gi:
            bad += 1
if bad:
    raise SystemExit(
        f"PROBE FAIL: {bad} chance near-dup pairs (est jaccard>=0.5) in a "
        f"{len(sample)}-doc sample of non-engineered docs — vocabulary or "
        "length distribution has regressed (see module docstring)")
print(f"probe: 0 chance near-dup pairs in {len(sample)}-doc sample")

# ---- embeddings -------------------------------------------------------
DIM = 64
centers = rng.normal(0, 0.08, (10, DIM))
label = rng.integers(0, 10, N_VEC)
emb = (centers[label] +
       rng.normal(0, 0.05, (N_VEC, DIM))).astype(np.float32)
write("embeddings", {
    "vec_id": pa.array(range(N_VEC), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(label, pa.int64())})

print(json.dumps({"sf": sf, "lineitem": N_LI, "events": N_EV,
                  "documents": N_DOC, "embeddings": N_VEC}))
