"""Scale-prove the pysqlite DataSource (r7 verdict item 5): build a
multi-million-row SQLite database from the scale corpus, then measure
the partitioned native-DataSource read against the serial class-based
Arrow ingest on (a) a full-scan aggregate and (b) a pushdown-selective
filter. Prints one JSON line per measurement and a summary dict.

Usage::

    python tools/bench_sqlite_scale.py [--sf-dir /tmp/dbmask_scale/sf1]
        [--db /tmp/dbmask_sqlite_lineitem.db] [--runs 3]

The .db build (parquet -> executemany in one transaction) is cached:
reruns reuse the file if its row count matches the parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sqlite3
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_db(sf_dir: str, db_path: str) -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/lineitem.parquet")
    n = t.num_rows
    if os.path.exists(db_path):
        con = sqlite3.connect(db_path)
        try:
            if con.execute("SELECT count(*) FROM lineitem").fetchone()[0] == n:
                con.close()
                print(f"# reusing {db_path} ({n} rows)")
                return n
        except sqlite3.Error:
            pass
        con.close()
        os.remove(db_path)
    cols = t.column_names
    decl = []
    for name in cols:
        f = t.schema.field(name)
        import pyarrow as pa

        if pa.types.is_integer(f.type):
            decl.append(f"{name} INTEGER")
        elif pa.types.is_floating(f.type) or pa.types.is_decimal(f.type):
            decl.append(f"{name} REAL")
        else:
            decl.append(f"{name} TEXT")
    con = sqlite3.connect(db_path)
    con.execute("PRAGMA journal_mode = OFF")
    con.execute("PRAGMA synchronous = OFF")
    con.execute(f"CREATE TABLE lineitem ({', '.join(decl)})")
    ph = ", ".join("?" * len(cols))
    t0 = time.perf_counter()
    # column-wise pylist then zip: far cheaper than per-row .as_py()
    for batch in t.to_batches(max_chunksize=100_000):
        data = list(zip(*[c.to_pylist() for c in batch.columns]))
        con.executemany(f"INSERT INTO lineitem VALUES ({ph})", data)
    con.commit()
    con.close()
    print(
        f"# built {db_path}: {n} rows, "
        f"{os.path.getsize(db_path) / 1e9:.2f} GB in "
        f"{time.perf_counter() - t0:.1f}s"
    )
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/dbmask_scale/sf1")
    ap.add_argument("--db", default="/tmp/dbmask_sqlite_lineitem.db")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    n_rows = build_db(args.sf_dir, args.db)

    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.session import get_spark
    from database_anonymiser_minimiser_spark.sources.sqlite import SqliteSource

    spark = get_spark(app_name="pysqlite-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(fn):
        runs = []
        fn()  # warm
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        runs.sort()
        return runs[len(runs) // 2], runs

    results = {"n_rows": n_rows, "db_gb": round(os.path.getsize(args.db) / 1e9, 3)}

    def full_agg(df):
        # full-scan aggregate: every byte crosses the Python->Arrow->JVM
        # boundary; this is the transport-throughput measurement
        return df.agg(
            F.sum("l_quantity"), F.count(F.lit(1))
        ).collect()

    def filtered(df):
        # selective filter (~1/7 of rows): measures pushdown + transport
        return df.filter(F.col("l_linenumber") == 1).agg(
            F.count(F.lit(1))
        ).collect()

    for label, parts in [("serial", 0), ("part4", 4), ("part8", 8), ("part16", 16)]:
        src = SqliteSource(spark, args.db, partitions=parts)
        med, runs = timed(lambda: full_agg(src.read("lineitem")))
        results[f"full_{label}"] = med
        print(json.dumps({"case": f"full_{label}", "median": med, "runs": runs}))
        med, runs = timed(lambda: filtered(src.read("lineitem")))
        results[f"filter_{label}"] = med
        print(json.dumps({"case": f"filter_{label}", "median": med, "runs": runs}))

    results["speedup_full_part8_vs_serial"] = round(
        results["full_serial"] / results["full_part8"], 2
    )
    results["speedup_filter_part8_vs_serial"] = round(
        results["filter_serial"] / results["filter_part8"], 2
    )
    print("SUMMARY " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
