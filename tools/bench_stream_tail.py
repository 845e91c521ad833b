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
    ap.add_argument(
        "--live",
        type=int,
        default=0,
        metavar="N_WAVES",
        help="live-tail mode (r10): run the CONTINUOUS stream (not "
        "--once) and append N_WAVES waves of --wave-rows rows each to "
        "the db WHILE it runs (WAL mode, separate writer connection — "
        "the CDC-lite contract's real regime); asserts exactly-once "
        "per-wave row accounting and reports append->visible latency",
    )
    ap.add_argument("--wave-rows", type=int, default=100_000)
    ap.add_argument("--trigger-seconds", type=int, default=1)
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
    if args.live:
        _run_live(spark, engine, db, out, chk, n_rows, args)
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
        return
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


def _run_live(spark, engine, db, out, chk, n_initial, args) -> None:
    """Concurrent-writes regime: continuous stream + a live writer on a
    separate connection. Each wave inserts ``wave_rows`` rows carrying a
    unique synthetic l_orderkey range, then polls the parquet dataset
    until every row of the wave is visible (exactly once) — the measured
    latency is append-commit -> sink-visible, which bounds the CDC lag a
    consumer of the masked dataset would observe."""
    wcon = sqlite3.connect(db)
    wcon.execute("PRAGMA journal_mode=WAL")  # single writer + live reader
    wcon.execute("PRAGMA busy_timeout=10000")
    cols = [r[1] for r in wcon.execute("PRAGMA table_info(lineitem)")]
    template = list(
        wcon.execute("SELECT * FROM lineitem LIMIT 1").fetchone()
    )
    okey_pos = cols.index("l_orderkey")

    q = engine.stream_table(
        "lineitem",
        out,
        chk,
        once=False,
        max_rows_per_batch=args.batch_rows,
        trigger_seconds=args.trigger_seconds,
    )
    waves = []
    try:
        # wait for the initial backlog to land before timing waves
        deadline = time.perf_counter() + 600
        while time.perf_counter() < deadline:
            try:
                if spark.read.parquet(out).count() >= n_initial:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
        base_key = 10_000_000  # above any generated o_orderkey
        for w in range(args.live):
            lo = base_key + w * args.wave_rows
            rows = []
            for i in range(args.wave_rows):
                r = list(template)
                r[okey_pos] = lo + i
                rows.append(r)
            t0 = time.perf_counter()
            wcon.executemany(
                f"INSERT INTO lineitem VALUES ({','.join('?' * len(cols))})",
                rows,
            )
            wcon.commit()
            t_commit = time.perf_counter()
            expected = n_initial + (w + 1) * args.wave_rows
            while True:
                try:
                    seen = spark.read.parquet(out).count()
                except Exception:
                    seen = 0
                if seen >= expected:
                    break
                if time.perf_counter() - t_commit > 600:
                    raise TimeoutError(
                        f"wave {w}: {seen}/{expected} rows after 600s"
                    )
                time.sleep(0.25)
            t_vis = time.perf_counter()
            waves.append(
                {
                    "wave": w,
                    "insert_sec": round(t_commit - t0, 2),
                    "visible_sec": round(t_vis - t_commit, 2),
                    "rows_per_sec": round(
                        args.wave_rows / (t_vis - t_commit)
                    ),
                }
            )
    finally:
        q.stop()
        wcon.close()
    got = spark.read.parquet(out)
    total = got.count()
    n_db = sqlite3.connect(db).execute(
        "SELECT count(*) FROM lineitem"
    ).fetchone()[0]
    # exactly-once accounting: total row count AND per-wave distinct
    # synthetic keys (a replayed micro-batch would duplicate a wave; a
    # dropped one would undercount)
    per_wave_ok = True
    for w in range(args.live):
        lo = 10_000_000 + w * args.wave_rows
        n_wave = got.filter(
            (got.l_orderkey >= lo) & (got.l_orderkey < lo + args.wave_rows)
        ).count()
        n_wave_distinct = (
            got.filter(
                (got.l_orderkey >= lo)
                & (got.l_orderkey < lo + args.wave_rows)
            )
            .select("l_orderkey")
            .distinct()
            .count()
        )
        if not (n_wave == n_wave_distinct == args.wave_rows):
            per_wave_ok = False
    print(
        json.dumps(
            {
                "mode": "live",
                "initial_rows": n_initial,
                "waves": waves,
                "rows_db": n_db,
                "rows_exported": total,
                "exactly_once": bool(total == n_db and per_wave_ok),
                "trigger_seconds": args.trigger_seconds,
                "batch_rows": args.batch_rows,
            }
        )
    )
    assert total == n_db and per_wave_ok, (total, n_db, per_wave_ok)


if __name__ == "__main__":
    main()
