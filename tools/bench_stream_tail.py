"""Measure the CDC-lite `stream` verb's drain throughput (r9): the
SQLite rowid tail is e2e-tested for correctness/resume, but its capacity
was never quantified. This tool drains an N-million-row lineitem.db
(built by tools/bench_sqlite_scale.py) through the real
Engine.stream_table path — masking in flight, parquet sink, checkpoint —
and reports rows/second per micro-batch size.

The tail reader is a SimpleDataSourceStreamReader (driver-side by
design: a SQLite file is a single-writer stream), so the expected
bottleneck is the driver's read+Arrow conversion, not the cluster —
which is exactly what this measures. Run:

    python tools/bench_stream_tail.py [--db /tmp/dbmask_sqlite_lineitem.db]
        [--batch-rows 1000000] [--limit-rows 0]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_anonymiser_minimiser_spark import config as config_mod  # noqa: E402
from database_anonymiser_minimiser_spark.plans.plan import Engine  # noqa: E402
from database_anonymiser_minimiser_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/tmp/dbmask_sqlite_lineitem.db")
    ap.add_argument("--batch-rows", type=int, default=1_000_000)
    ap.add_argument(
        "--limit-rows",
        type=int,
        default=0,
        help="copy only the first N rows into a scratch db (0 = full)",
    )
    args = ap.parse_args()

    db = args.db
    if args.limit_rows:
        scratch = tempfile.mktemp(prefix="dbmask_tail_", suffix=".db")
        src = sqlite3.connect(db)
        dst = sqlite3.connect(scratch)
        src.row_factory = None
        ddl = src.execute(
            "SELECT sql FROM sqlite_master WHERE name='lineitem'"
        ).fetchone()[0]
        dst.execute(ddl)
        dst.executemany(
            f"INSERT INTO lineitem VALUES ({','.join('?' * len(src.execute('SELECT * FROM lineitem LIMIT 1').fetchone()))})",
            src.execute(f"SELECT * FROM lineitem LIMIT {args.limit_rows}"),
        )
        dst.commit()
        dst.close()
        src.close()
        db = scratch

    n_rows = sqlite3.connect(db).execute(
        "SELECT count(*) FROM lineitem"
    ).fetchone()[0]

    work = tempfile.mkdtemp(prefix="dbmask_tailbench_")
    cfg_path = os.path.join(work, "cfg.yaml")
    with open(cfg_path, "w") as fh:
        fh.write(
            "connection: {type: sqlite, file: %s}\n"
            "configuration:\n"
            "  lineitem:\n"
            "    primary_key: l_orderkey\n"
            "    columns: {l_shipmode: '{{faker.text}}'}\n" % db
        )
    spark = get_spark(app_name="stream-tail-bench")
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine(spark, config_mod.load(cfg_path))

    out = os.path.join(work, "out")
    chk = os.path.join(work, "chk")
    t0 = time.perf_counter()
    q = engine.stream_table(
        "lineitem", out, chk, once=True, max_rows_per_batch=args.batch_rows
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    got = spark.read.parquet(out).count()
    print(
        json.dumps(
            {
                "db": os.path.basename(db),
                "rows": n_rows,
                "rows_exported": got,
                "batch_rows": args.batch_rows,
                "n_batches": (n_rows + args.batch_rows - 1) // args.batch_rows,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(got / wall),
            }
        )
    )
    assert got == n_rows, (got, n_rows)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
