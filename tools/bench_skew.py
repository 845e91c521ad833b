"""Skewed-corpus probe: value-exactness and wall-clock under zipfian keys.

Every scale sweep so far ran on uniform-synthetic corpora; this tool runs
the hot-key movers on the `gen_corpus.py --skew` variant (zipf s=1.3,
hottest key ~25% of rows on o_custkey / l_partkey / l_suppkey /
events.user_id, 80%-hot documents.lang) against the uniform corpus at the
same scale factor, on the same session, interleaved — so a pathological
skew wall shows up as a ratio, not an absolute.

Two parts:

1. **Registered movers** (the r9 verdict's named set — funnels, streaming
   heavy hitters, the consistency join — plus the custkey/suppkey join
   and group-by shapes): timed at both corpora; result-row counts
   recorded. Value correctness for these comes from the full oracle
   replica sweep run separately on the skewed dir
   (`SPARK_GRAFT_TEST_SF_DIR=... pytest tests/test_queries_oracle.py`).
2. **salted_agg / salted_join direct probe**: the skew mitigations from
   `operators/skew.py` exercised on the genuinely hot events.user_id —
   asserts the salted results EQUAL the plain ones on the skewed corpus
   (unit tests only ever used a 1000-row toy) and reports plain-vs-salted
   wall for both corpora.

Usage:
    python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1
    python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1_skew --skew
    python tools/bench_skew.py [--runs 3] [--out SCALING_skew_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# hot-key movers: every query here shuffles or joins on a column the
# --skew generator makes zipfian
MOVERS = [
    "q18_large_volume_customers",   # groupBy l_orderkey + o_custkey join
    "q5_local_supplier_volume",     # custkey/suppkey join chain
    "bucketed_join_segment_revenue",  # custkey fact-fact join
    "consistency_mapping",          # value-mapping join (reference anonymiser.go:74-91)
    "funnel_view_click_purchase",   # events.user_id sessionisation
    "funnel_windowed_24h",          # events.user_id window funnel
    "cohort_retention_weekly",      # events.user_id cohort join
    "events_resample_hourly_dense", # event_type x hour dense grid
    "streaming_heavy_hitters_users",  # user_id heavy hitters (stateful)
]

POINTS = [
    ("uniform", "/tmp/dbmask_scale/sf1"),
    ("skew", "/tmp/dbmask_scale/sf1_skew"),
]


def _median(ts: list[float]) -> float:
    return statistics.median(ts)


def bench_movers(spark, queries, runs: int):
    timings: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for name in MOVERS:
        fn = queries[name]
        # interleave corpora per query so machine drift hits both sides
        for label, d in POINTS:
            fn(spark, d).count()  # warm
            ts = []
            for _ in range(runs):
                t = time.monotonic()
                n = fn(spark, d).count()
                ts.append(time.monotonic() - t)
            med = _median(ts)
            timings.setdefault(name, {})[label] = round(med, 3)
            rows.setdefault(name, {})[label] = n
            print(f"{label:8s} {name}: {med:.3f}s ({n} rows)", flush=True)
            spark.catalog.clearCache()
    return timings, rows


def probe_salted(spark, runs: int):
    """salted_agg / salted_join on the genuinely hot events.user_id."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators import skew as S

    out: dict[str, dict] = {}
    for label, d in POINTS:
        ev = spark.read.parquet(os.path.join(d, "events.parquet"))

        plain_df = ev.groupBy("user_id").agg(
            F.sum("value").alias("total"),
            F.count(F.lit(1)).alias("cnt"),
            F.max("ts").alias("mx"),
        )
        salted_df = S.salted_agg(
            ev,
            ["user_id"],
            {"total": ("sum", "value"),
             "cnt": ("count", None),
             "mx": ("max", "ts")},
            salt_buckets=32,
            deterministic_from="event_id",
        )
        plain = {r["user_id"]: (r["total"], r["cnt"], r["mx"])
                 for r in plain_df.collect()}
        salted = {r["user_id"]: (r["total"], r["cnt"], r["mx"])
                  for r in salted_df.collect()}
        # count/max are exact; the float sum is compared at 1e-9 relative
        # tolerance (double addition is order-dependent and Spark's plain
        # sum order is itself nondeterministic across partitions)
        agg_equal = set(plain) == set(salted) and all(
            p[1] == s[1] and p[2] == s[2]
            and abs(p[0] - s[0]) <= 1e-9 * max(1.0, abs(p[0]))
            for p, s in ((plain[k], salted[k]) for k in plain)
        )

        # salted join: per-user dim (small side) against the hot fact
        dim = (ev.select("user_id").distinct()
                 .withColumn("seg", F.pmod(F.col("user_id"), F.lit(7))))
        plain_j = ev.join(dim, "user_id").groupBy("seg").count()
        salted_j = (S.salted_join(ev, dim, "user_id", salt_buckets=32,
                                  deterministic_from="event_id")
                     .groupBy("seg").count())
        join_equal = ({(r["seg"], r["count"]) for r in plain_j.collect()}
                      == {(r["seg"], r["count"]) for r in salted_j.collect()})

        def med_wall(df):
            df.count()
            ts = []
            for _ in range(runs):
                t = time.monotonic()
                df.count()
                ts.append(time.monotonic() - t)
            return round(_median(ts), 3)

        out[label] = {
            "n_users": len(plain),
            "hottest_user_rows": max(c for (_t, c, _m) in plain.values()),
            "total_rows": sum(c for (_t, c, _m) in plain.values()),
            "agg_equal": agg_equal,
            "join_equal": join_equal,
            "wall_plain_agg": med_wall(plain_df),
            "wall_salted_agg": med_wall(salted_df),
            "wall_plain_join": med_wall(plain_j),
            "wall_salted_join": med_wall(salted_j),
        }
        print(f"{label:8s} salted probe: {out[label]}", flush=True)
        spark.catalog.clearCache()
        if not (agg_equal and join_equal):
            raise SystemExit(f"salted mismatch on {label} corpus")
    return out


# streaming stateful family (r10 verdict item 5): the r10 zipf probe
# covered the batch replica + the interval join; these run the full
# micro-batch harness on the zipfian corpus, where the hottest user is
# ONE giant state key — the shape that hid the r10 interval-join
# quadratic. Wall AND state-store size are recorded (a quadratic shows
# as a wall ratio; an eviction bug shows as state rows growing past the
# uniform corpus').
STREAMING_STATEFUL = [
    "streaming_sessions_gap",        # session_window merge state
    "streaming_stateful_user_totals",  # applyInPandasWithState per-user
    "streaming_percentiles_tdigest",   # stateful t-digest quantiles
    # streaming_heavy_hitters_users is in MOVERS (timed there); its
    # capped Misra-Gries state is additionally captured here
    "streaming_heavy_hitters_users",
]


def probe_streaming_stateful(spark, queries, runs: int):
    from pyspark.sql.streaming import StreamingQueryListener

    class _StateCapture(StreamingQueryListener):
        def __init__(self):
            self.reset()

        def reset(self):
            self.max_rows = 0
            self.max_mem = 0
            self.batches = 0

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            self.batches += 1
            for so in event.progress.stateOperators:
                self.max_rows = max(self.max_rows, so.numRowsTotal)
                self.max_mem = max(self.max_mem, so.memoryUsedBytes)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    cap = _StateCapture()
    spark.streams.addListener(cap)
    out: dict[str, dict[str, dict]] = {}
    try:
        for name in STREAMING_STATEFUL:
            fn = queries[name]
            for label, d in POINTS:
                ts, rows_out = [], 0
                state_rows, state_mem, batches = 0, 0, 0
                for _ in range(runs):
                    cap.reset()
                    t = time.monotonic()
                    rows_out = fn(spark, d).count()
                    ts.append(time.monotonic() - t)
                    time.sleep(1.5)  # listener events are async
                    state_rows = max(state_rows, cap.max_rows)
                    state_mem = max(state_mem, cap.max_mem)
                    batches = max(batches, cap.batches)
                out.setdefault(name, {})[label] = {
                    "wall_median": round(_median(ts), 3),
                    "result_rows": rows_out,
                    "max_state_rows": state_rows,
                    "max_state_mem_bytes": state_mem,
                    "progress_events": batches,
                }
                print(f"{label:8s} {name}: {out[name][label]}", flush=True)
                spark.catalog.clearCache()
    finally:
        spark.streams.removeListener(cap)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="SCALING_skew_r10.json")
    ap.add_argument(
        "--only",
        choices=["movers", "salted", "streaming"],
        default=None,
        help="run a single probe section (default: all)",
    )
    args = ap.parse_args()

    for _label, d in POINTS:
        if not os.path.isdir(d):
            raise SystemExit(f"missing corpus {d}; run tools/gen_corpus.py")

    from database_anonymiser_minimiser_spark.queries import QUERIES
    from database_anonymiser_minimiser_spark.session import get_spark

    spark = get_spark()
    payload = {
        "runs": args.runs,
        "sf": 1.0,
        "corpora": {label: d for label, d in POINTS},
    }
    if args.only in (None, "movers"):
        timings, rows = bench_movers(spark, QUERIES, args.runs)
        payload["timings_sec"] = timings
        payload["result_rows"] = rows
    if args.only in (None, "salted"):
        payload["salted_probe"] = probe_salted(spark, args.runs)
    if args.only in (None, "streaming"):
        payload["streaming_stateful_probe"] = probe_streaming_stateful(
            spark, QUERIES, args.runs
        )
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
