"""Synthesize a larger-sf twin of the driver's testdata tables (VERDICT r7
item 5: /root/testdata caps at sf0.1, but double-sum order dependence grows
with row count, so the rounding-sensitive oracle set needs probing above
that).

The engine-vs-DuckDB comparison runs both sides on the SAME parquet, so the
data only has to match the driver tables' SCHEMA and broad shape (key
cardinalities, value domains) — not their exact generator. Everything is
deterministic (one seeded numpy Generator), vectorized, and written with
pyarrow directly (no Spark session needed to generate).

    python tools/synth_sf.py [sf] [out_dir]     # default 0.3 /tmp/synth_sf0.3

then probe with:

    python tools/check_oracles.py --json CORRECTNESS_local_sf0.3.json \
        /tmp/synth_sf0.3 [query ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# row counts at sf=0.01 (TESTDATA.md tables); other sfs scale linearly
BASE = {
    "customer": 1_500,
    "orders": 15_000,
    "lineitem": 60_000,  # approximate: generated as ~4 lines per order
    "events": 10_000,
    "documents": 500,
    "embeddings": 500,
    "part": 2_000,
    "supplier": 100,
}

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window order data column join small customer query big "
    "stream group filter"
).split()

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _ts(rng, n: int, lo: str, hi: str, day_resolution: bool = False):
    lo_us = np.datetime64(lo).astype("datetime64[us]").astype(np.int64)
    hi_us = np.datetime64(hi).astype("datetime64[us]").astype(np.int64)
    if day_resolution:
        day = 86_400_000_000
        vals = rng.integers(lo_us // day, hi_us // day, n) * day
    else:
        vals = rng.integers(lo_us, hi_us, n)
    return pa.array(vals.astype("datetime64[us]"))


def generate(sf: float, out_dir: str) -> dict:
    rng = np.random.default_rng(20240300 + int(sf * 1000))
    mult = sf / 0.01
    n = {t: int(c * mult) for t, c in BASE.items()}
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        written[name] = table.num_rows

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 5000, nc), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    ns = n["supplier"]
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, ns), 2),
    }))

    np_ = n["part"]
    brands = [f"Brand#{i}" for i in range(1, 6)]
    t1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    t2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    t3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
    # p_name mirrors the driver tables' CLOSED vocabulary ("small ring",
    # "red widget", ...): DISTINCT lower(p_name) stays ~|adj|x|noun|
    # regardless of sf — er_fuzzy_name_pairs dedups names before its
    # blocked self-join, and per-row-unique names would blow its block
    # quadratic up with sf (one prefix block x 60k names = 1.8B pairs)
    adjs = ["small", "red", "blue", "hot", "large", "green", "cold",
            "dim", "shiny", "plain"]
    nouns = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "washer",
             "pin", "lever", "spring"]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(np_), pa.int64()),
        "p_name": [
            f"{adjs[a]} {nouns[b]}"
            for a, b in zip(
                rng.integers(0, len(adjs), np_),
                rng.integers(0, len(nouns), np_),
            )
        ],
        "p_brand": pa.array(np.array(brands)[rng.integers(0, 5, np_)]),
        "p_type": [
            f"{t1[a]} {t2[b]} {t3[c]}"
            for a, b, c in zip(
                rng.integers(0, 6, np_),
                rng.integers(0, 5, np_),
                rng.integers(0, 5, np_),
            )
        ],
        "p_size": pa.array(rng.integers(1, 51, np_), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, np_), 2),
    }))

    no = n["orders"]
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": _ts(rng, no, "1995-01-01", "2001-08-02", True),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    # lineitem: 1..7 lines per order (line numbers are a real sequence per
    # order — some queries tiebreak on (orderkey, linenumber))
    lines = rng.integers(1, 8, no)
    target = n["lineitem"]
    # take orders (in key order) until the cumulative line total hits target
    cum = np.cumsum(lines)
    cut = min(int(np.searchsorted(cum, target)) + 1, no)
    okeys = np.repeat(np.arange(cut), lines[:cut])
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines[:cut]])
    nl = len(okeys)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, np_, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nl)]),
        "l_shipdate": _ts(rng, nl, "1995-01-01", "2001-11-05", True),
    }))

    ne = n["events"]
    n_users = int(150 * mult)
    write("events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": _ts(rng, ne, "2024-01-01", "2024-01-31"),
        "user_id": pa.array(rng.integers(0, n_users, ne), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.uniform(0.01, 490.03, ne), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), rng.integers(25, 90))])
        for _ in range(nd)
    ]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(["en", "de", "fr", "es", "zh"])[
                rng.choice(5, nd, p=[0.44, 0.14, 0.13, 0.14, 0.15])
            ]
        ),
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    emb = rng.normal(0, 1, (nv, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
    }))
    return written


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/synth_sf{sf}"
    written = generate(sf, out)
    print(json.dumps({"sf": sf, "out": out, "rows": written}))


if __name__ == "__main__":
    main()
