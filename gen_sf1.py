"""Generate an sf1 corpus (10x sf0.1) with GENUINE cardinality growth.

The bench 30x/100x probes rotate copies of sf0.1 — good for wall-clock
scaling, but distinct counts, cluster counts, and registry sizes grow
sub-linearly in a copy-rotated corpus. This generator draws FRESH rows
(~1.5M orders / 6M lineitem / 1M events / 50k documents / 20k
embeddings) with the same schema and value distributions as the driver's
testdata (TESTDATA.md), so an sf1 sweep exercises real growth in
distincts and clusters. Deterministic (seed 1); region/nation are the
fixed TPC-H dimension tables copied verbatim from sf0.1.

Output: spark-warehouse/sf1/*.parquet (gitignored). Timestamps are
written as TIMESTAMP(NANOS) to match the driver generator's parquet
type. Usage: python gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SF = 10  # vs sf0.1

VOCAB = ("spark line column order small sort fast value scan batch part "
         "query agg table hash the a big merge group filter stream key "
         "join slow customer vector").split()
LANGS = ["en"] * 8 + ["fr", "es", "de", "zh"] * 1  # ~2/3 en like sf0.1
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64") * 1000, type=pa.timestamp("ns"))


def gen(out_dir: str) -> None:
    rng = np.random.default_rng(1)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    # fixed dimensions: copy verbatim
    for t in ("region", "nation"):
        write(t, pq.read_table(os.path.join(SRC, f"{t}.parquet")))

    n_cust, n_supp, n_part = 15000 * SF, 1000 * SF, 20000 * SF
    n_ord, n_li, n_ev = 150000 * SF, 600000 * SF, 100000 * SF
    n_doc, n_emb = 5000 * SF, 2000 * SF

    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in
                         rng.integers(0, 5, n_cust)],
    }))

    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    types = [f"{a} {b} {c}" for a in ("STANDARD", "SMALL", "MEDIUM",
                                      "LARGE", "ECONOMY", "PROMO")
             for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED",
                       "BRUSHED")
             for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [" ".join(VOCAB[j % len(VOCAB)] for j in
                            (i, i * 7 + 1, i * 13 + 2))
                   for i in range(n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [types[i] for i in rng.integers(0, len(types), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
    }))

    # orders over the same 1995..2001 window
    date0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(
        "int64")
    date1 = np.datetime64("2001-08-02").astype("datetime64[us]").astype(
        "int64")
    o_dates = rng.integers(date0, date1, n_ord)
    o_dates = (o_dates // 86_400_000_000) * 86_400_000_000  # midnight
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("O", "P", "F")[i] for i in
                          rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(800.0, 500000.0, n_ord), 2),
        "o_orderdate": _ts_array(o_dates),
        "o_orderpriority": [PRIORITIES[i] for i in
                            rng.integers(0, 5, n_ord)],
    }))

    # lineitem: ~4 lines/order, shipdate = orderdate + 1..120 days
    l_ord = rng.integers(0, n_ord, n_li)
    l_ship = (o_dates[l_ord]
              + rng.integers(1, 121, n_li) * 86_400_000_000)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(l_ord, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in
                         rng.integers(0, 3, n_li)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_array(l_ship),
    }))

    # events: 30 days from 2024-01-01, 10x the users
    ev0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(
        "int64")
    ev_ts = np.sort(rng.integers(ev0, ev0 + 30 * 86_400_000_000, n_ev))
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_array(ev_ts),
        "user_id": pa.array(rng.integers(0, 1500 * SF, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0.0, 200.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: fresh word-salad text (the sf0.1 vocabulary), ~0.2%
    # exact dups and ~1% near-dups planted so dedup finds real work
    lens = rng.integers(8, 96, n_doc)
    texts = []
    for i in range(n_doc):
        words = rng.integers(0, len(VOCAB), lens[i])
        texts.append(" ".join(VOCAB[w] for w in words))
    for i in rng.choice(n_doc, n_doc // 500, replace=False):
        texts[i] = texts[(i * 31 + 7) % n_doc]  # exact dup
    for i in rng.choice(n_doc, n_doc // 100, replace=False):
        src = texts[(i * 17 + 3) % n_doc]
        texts[i] = src + " tail" + str(i % 7)  # near dup
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 gaussian clusters in 64-dim, like the planted
    # label structure of the driver corpus
    cents = rng.normal(0, 1.0, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (cents[labels]
            + rng.normal(0, 0.25, (n_emb, 64))).astype("float32")
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "spark-warehouse",
        "sf1")
    gen(out)
