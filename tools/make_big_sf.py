"""Generate a scaled synthetic sf dir matching /root/testdata's shapes.

The driver's round-end MEASUREMENT may use a larger, driver-generated
scale factor than the sf0.1 this repo benches with, so optimizations must
hold at both sizes. This tool clones the testdata distributions (measured
empirically: vocab, row counts per sf decade, value ranges, category
frequencies, unit-norm embeddings with uniform labels) at a chosen
multiplier so the full 109-query surface can be stress-run at
driver-measurement scale. Row-count scaling follows the observed
sf0.01 -> sf0.1 ratios: x10 for every table except embeddings (x4 per
decade, matching the sub-linear growth the O(n^2) similarity queries get).

Usage: python tools/make_big_sf.py OUT_DIR [MULT]

Deterministic (seed 1234 + per-table offsets). Not the driver's exact
generator — distributions match, byte content does not — so it is for
PERFORMANCE runs only, never oracle checks.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = np.array(
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query a big key window row table stream merge data join "
    "customer dup the vector".split()
)
assert len(VOCAB) == 31

LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
EVENT_TYPES = np.array(["signup", "click", "error", "view", "purchase"])
SEGMENTS = np.array(
    ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
)
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
P_TYPES = np.array(["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"])
P_ADJ = np.array(["large", "hot", "small", "dim", "cold", "new", "old"])
P_NOUN = np.array(["ring", "bolt", "washer", "nut", "screw", "plate"])


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", flush=True)


def documents(out: str, mult: int) -> None:
    rng = np.random.default_rng(1234)
    n = 5000 * mult
    lens = rng.integers(10, 101, n)
    words = VOCAB[rng.integers(0, len(VOCAB), int(lens.sum()))]
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(words[pos : pos + ln]))
        pos += ln
    langs = LANGS[rng.choice(len(LANGS), n, p=LANG_P)]
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, n)])
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )


def events(out: str, mult: int) -> None:
    rng = np.random.default_rng(1235)
    n = 100_000 * mult
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 86400 * 1_000_000
    gap = span_us // n
    ts = base_us + np.arange(n, dtype="int64") * gap + rng.integers(0, gap, n)
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, 1500 * mult, n), pa.int64()
                ),
                "event_type": EVENT_TYPES[rng.integers(0, 5, n)],
                "value": np.round(rng.uniform(0, 500, n), 2),
                "props": np.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]
                ),
            }
        ),
    )


def embeddings(out: str, mult: int) -> None:
    rng = np.random.default_rng(1236)
    # embeddings grow x4 per sf decade (sf0.01: 500 -> sf0.1: 2000)
    n = 2000 * max(1, round(4 * mult / 10)) if mult >= 10 else 2000 * mult
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, n), pa.int32()),
            }
        ),
    )


def relational(out: str, mult: int) -> None:
    rng = np.random.default_rng(1237)
    n_li, n_ord = 600_000 * mult, 150_000 * mult
    n_cust, n_part, n_supp = 15_000 * mult, 20_000 * mult, 1_000 * mult
    day_us = 86400 * 1_000_000
    ship0 = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.arange(n_li, dtype="int64") // 4 % n_ord, pa.int64()
                ),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(
                    (np.arange(n_li) % 4 + 1).astype("int32"), pa.int32()
                ),
                "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": np.array(["A", "N", "R"])[
                    rng.integers(0, 3, n_li)
                ],
                "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
                "l_shipdate": pa.array(
                    ship0 + rng.integers(0, 2500, n_li) * day_us,
                    pa.timestamp("us"),
                ),
            }
        ),
    )
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": np.array(["O", "F", "P"])[
                    rng.integers(0, 3, n_ord)
                ],
                "o_totalprice": np.round(rng.uniform(900, 400_000, n_ord), 2),
                "o_orderdate": pa.array(
                    ship0 + rng.integers(0, 2500, n_ord) * day_us,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)],
            }
        ),
    )
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": np.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
                "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
            }
        ),
    )
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": np.char.add(
                    np.char.add(P_ADJ[rng.integers(0, len(P_ADJ), n_part)], " "),
                    P_NOUN[rng.integers(0, len(P_NOUN), n_part)],
                ),
                "p_brand": np.array(
                    [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]
                ),
                "p_type": P_TYPES[rng.integers(0, 5, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
            }
        ),
    )
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": np.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
            }
        ),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_big"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    documents(out, mult)
    events(out, mult)
    embeddings(out, mult)
    relational(out, mult)
    for small in ("region", "nation"):
        shutil.copy(
            os.path.join(SRC, f"{small}.parquet"),
            os.path.join(out, f"{small}.parquet"),
        )
        print(f"{small}: copied", flush=True)
    open(os.path.join(out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
