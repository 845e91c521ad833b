"""Deterministic synthetic-corpus generator for scaling measurements.

The driver corpora (`/root/testdata/sf{0.001,0.01,0.1}`, TESTDATA.md) top
out at sf0.1, so every scale claim beyond that was plan-shape evidence
only. This tool regenerates the same tables with the same seed-42
discipline, schemas, and value distributions (calibrated against the
driver's sf0.1 statistics — see inline notes) at ANY scale factor, so the
heavy operators can be measured on a real sf0.01 / 0.1 / 1 curve
(tools/bench_scaling.py, PERFORMANCE.md "Measured scaling").

The generated corpus is statistically equivalent, not byte-identical, to
the driver's: timings across MY three points are internally consistent,
and the generated sf0.1 is anchored against the driver's sf0.1 to show
the generator itself doesn't shift the workload.

Usage:
    python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD", "PROMO"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
# driver sf0.1: en ~41%, rest ~15% each
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
# the 31-word vocabulary observed verbatim in the driver documents
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ADJS = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
NOUNS = ["ring", "bolt", "screw", "plate", "gear", "tube", "rod", "cap"]

DAY_US = 86_400_000_000


def _rng(table: str) -> np.random.Generator:
    # per-table stream (crc32, not hash(): PYTHONHASHSEED-independent):
    # adding tables or reordering generation never changes another
    # table's values
    import zlib

    return np.random.default_rng([SEED, zlib.crc32(table.encode())])


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(days_from_epoch_us: np.ndarray) -> pa.Array:
    return pa.array(days_from_epoch_us.astype("int64"), pa.timestamp("us"))



def _zipf_ids(
    r: np.random.Generator, n_keys: int, size: int, s: float = 1.3
) -> np.ndarray:
    """Zipfian key draw over [0, n_keys): P(k) ~ 1/(k+1)^s. With s=1.3
    the hottest key takes ~25% of all rows — the hot-user / hot-customer
    / hot-partkey regime the uniform corpora never exercise."""
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    p = ranks ** -s
    p /= p.sum()
    return r.choice(n_keys, size=size, p=p).astype(np.int64)


def gen_region_nation(out: str) -> None:
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
    }))


def gen_customer(out: str, sf: float) -> int:
    n = int(150_000 * sf)
    r = _rng("customer")
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": r.integers(0, 25, n, dtype=np.int32),
        "c_acctbal": np.round(r.uniform(-999.99, 9999.99, n), 2),
        "c_mktsegment": np.array(SEGMENTS)[r.integers(0, 5, n)],
    }))
    return n


def gen_supplier(out: str, sf: float) -> None:
    n = max(10, int(10_000 * sf))
    r = _rng("supplier")
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n)],
        "s_nationkey": r.integers(0, 25, n, dtype=np.int32),
        "s_acctbal": np.round(r.uniform(-999.99, 9999.99, n), 2),
    }))


def gen_part(out: str, sf: float) -> int:
    n = max(200, int(200_000 * sf))
    r = _rng("part")
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n, dtype=np.int64),
        "p_name": [
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(r.integers(0, 8, n), r.integers(0, 8, n))
        ],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
            r.integers(0, 25, n)
        ],
        "p_type": np.array(PTYPES)[r.integers(0, 6, n)],
        "p_size": r.integers(1, 51, n, dtype=np.int32),
        "p_retailprice": np.round(r.uniform(900.0, 999.9, n), 2),
    }))
    return n


def gen_orders_lineitem(
    out: str, sf: float, n_cust: int, n_part: int, skew: bool = False
) -> None:
    n = int(1_500_000 * sf)
    r = _rng("orders")
    base = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    span_days = (
        np.datetime64("2001-08-01") - np.datetime64("1995-01-01")
    ).astype(int)
    odate_days = r.integers(0, span_days + 1, n)
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": (_zipf_ids(r, n_cust, n) if skew else
                      r.integers(0, n_cust, n).astype(np.int64)),
        "o_orderstatus": np.array(["O", "P", "F"])[r.integers(0, 3, n)],
        "o_totalprice": np.round(r.uniform(1000.0, 500_000.0, n), 2),
        "o_orderdate": _ts_us(base + odate_days * DAY_US),
        "o_orderpriority": np.array(PRIORITIES)[r.integers(0, 5, n)],
    }))

    # lineitem: Poisson(4)+clip(1) lines per order, ~4x orders
    rl = _rng("lineitem")
    per_order = np.clip(rl.poisson(4.0, n), 1, None)
    m = int(per_order.sum())
    okey = np.repeat(np.arange(n, dtype=np.int64), per_order)
    linenum = (
        np.arange(m, dtype=np.int64)
        - np.repeat(np.cumsum(per_order) - per_order, per_order)
    ) % 7 + 1
    qty = rl.integers(1, 51, m).astype("float64")
    _write(out, "lineitem", pa.table({
        "l_orderkey": okey,
        "l_partkey": (_zipf_ids(rl, n_part, m) if skew else
                      rl.integers(0, n_part, m).astype(np.int64)),
        "l_suppkey": (
            _zipf_ids(rl, max(10, int(10_000 * sf)), m) if skew else
            rl.integers(0, max(10, int(10_000 * sf)), m).astype(np.int64)
        ),
        "l_linenumber": linenum.astype(np.int32),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rl.uniform(900.0, 2100.0, m), 2),
        "l_discount": np.round(rl.uniform(0.0, 0.1, m), 2),
        "l_tax": np.round(rl.uniform(0.0, 0.08, m), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rl.integers(0, 3, m)],
        "l_linestatus": np.array(["F", "O"])[rl.integers(0, 2, m)],
        "l_shipdate": _ts_us(
            base + (np.repeat(odate_days, per_order) + rl.integers(1, 96, m))
            * DAY_US
        ),
    }))


def gen_events(out: str, sf: float, skew: bool = False) -> None:
    n = int(1_000_000 * sf)
    users = max(15, int(15_000 * sf))
    r = _rng("events")
    base = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span_us = 30 * DAY_US
    _write(out, "events", pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": _ts_us(base + np.sort(r.integers(0, span_us, n))),
        "user_id": (_zipf_ids(r, users, n) if skew else
                    r.integers(0, users, n).astype(np.int64)),
        "event_type": np.array(EVENT_TYPES)[r.integers(0, 5, n)],
        "value": np.round(r.exponential(50.0, n), 2),
        "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, n)],
    }))


def gen_documents(out: str, sf: float, skew: bool = False) -> None:
    """Word-salad docs over the 31-word vocab, uniform 10-100 words,
    5 langs / 20 sources — plus injected duplicate structure so the
    dedup family has real work at every scale: ~3% near-dups (copy of an
    earlier doc with ~8% of words replaced) and ~0.2% exact dups,
    matching the dup density observed in the driver's sf0.1."""
    n = max(500, int(50_000 * sf))
    r = _rng("documents")
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n):
        u = r.random()
        if i > 10 and u < 0.002:  # exact dup
            texts.append(texts[int(r.integers(0, i))])
        elif i > 10 and u < 0.032:  # near dup
            words = texts[int(r.integers(0, i))].split(" ")
            k = max(1, int(0.08 * len(words)))
            for j in r.integers(0, len(words), k):
                words[int(j)] = vocab[int(r.integers(0, len(vocab)))]
            texts.append(" ".join(words))
        else:
            texts.append(
                " ".join(vocab[r.integers(0, len(vocab), r.integers(10, 101))])
            )
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[
            r.choice(5, n, p=([0.8, 0.1, 0.05, 0.03, 0.02] if skew else LANG_P))
        ],
        "source": np.array([f"src{i}" for i in range(20)])[
            _zipf_ids(r, 20, n) if skew else r.integers(0, 20, n)
        ],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))


def gen_embeddings(out: str, sf: float) -> None:
    """Random 64-dim unit vectors with INDEPENDENT labels — measured
    against the driver's sf0.1: intra-label and inter-label cosine are
    both ~0 there (no cluster structure), ~5% of random pairs clear the
    neardup threshold of 0.2. Component std matches 1/sqrt(64)."""
    n = max(500, int(20_000 * sf))
    r = _rng("embeddings")
    labels = r.integers(0, 10, n).astype(np.int32)
    vecs = r.normal(0, 1, (n, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": labels,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--skew", action="store_true",
        help="zipfian hot keys (s=1.3: hottest key ~25%% of rows) on "
        "o_custkey / l_partkey / l_suppkey / events.user_id / "
        "documents.lang+source — the skewed-join/agg probe corpus",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    print(f"generating sf={args.sf} -> {args.out}")
    gen_region_nation(args.out)
    n_cust = gen_customer(args.out, args.sf)
    gen_supplier(args.out, args.sf)
    n_part = gen_part(args.out, args.sf)
    gen_orders_lineitem(args.out, args.sf, n_cust, n_part, skew=args.skew)
    gen_events(args.out, args.sf, skew=args.skew)
    gen_documents(args.out, args.sf, skew=args.skew)
    gen_embeddings(args.out, args.sf)
    print("done")


if __name__ == "__main__":
    main()
