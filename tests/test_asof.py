"""As-of join semantics on hand-built fixtures: at-or-before matching,
tie handling, no-match NULLs, and equivalence with the naive
pair-and-filter formulation."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database_anonymiser_minimiser_spark.operators.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def fixtures(spark):
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100, 9.9),
            (1, ts("2024-01-01 11:00:00"), 101, 10.1),
            (1, ts("2024-01-01 11:00:00"), 102, 10.2),  # tie: higher key wins
            (2, ts("2024-01-01 09:00:00"), 200, 55.0),
        ],
        ["key", "qt", "qid", "price"],
    )
    trades = spark.createDataFrame(
        [
            (1, 1, ts("2024-01-01 10:30:00")),  # -> quote 100
            (2, 1, ts("2024-01-01 11:00:00")),  # exactly at tie -> 102
            (3, 1, ts("2024-01-01 09:00:00")),  # before any quote -> NULL
            (4, 2, ts("2024-01-01 12:00:00")),  # -> quote 200
            (5, 3, ts("2024-01-01 12:00:00")),  # key with no quotes -> NULL
        ],
        ["trade_id", "key", "tt"],
    )
    return trades, quotes


def run(trades, quotes):
    out = asof_join(
        trades, quotes,
        left_key="key", right_key="key",
        left_time="tt", right_time="qt",
        payload_cols=["qid", "price"],
        tiebreak_col="qid",
    )
    return {r["trade_id"]: (r["qid"], r["price"]) for r in out.collect()}


def test_at_or_before_semantics(spark, fixtures):
    trades, quotes = fixtures
    got = run(trades, quotes)
    assert got[1] == (100, 9.9)      # strictly-before quote
    assert got[2] == (102, 10.2)     # equality matches; tie -> max tiebreak
    assert got[3] == (None, None)    # nothing before
    assert got[4] == (200, 55.0)
    assert got[5] == (None, None)    # key never quoted


def test_null_payload_carried_atomically(spark):
    """A matched right row whose payload value is NULL must be returned
    as-is — NOT skipped in favour of an older non-null value, and never
    stitched together from different right rows (regression: per-column
    last(ignorenulls) did exactly that)."""
    from pyspark.sql import types as T

    qschema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("qt", T.TimestampType()),
            T.StructField("qid", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100, 9.9),
            (1, ts("2024-01-01 11:00:00"), 101, None),  # newer, NULL price
        ],
        qschema,
    )
    trades = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 12:00:00"))], ["trade_id", "key", "tt"]
    )
    out = asof_join(
        trades, quotes, "key", "key", "tt", "qt", ["qid", "price"],
        tiebreak_col="qid",
    ).collect()[0]
    assert out["qid"] == 101
    assert out["price"] is None  # the newer row's NULL, not 9.9 from the older


def test_row_count_preserved(spark, fixtures):
    trades, quotes = fixtures
    out = asof_join(
        trades, quotes, "key", "key", "tt", "qt", ["qid"], tiebreak_col="qid"
    )
    assert out.count() == trades.count()


def test_matches_naive_formulation(spark, sf_dir):
    """Union-merge result == pair-and-filter result on real corpus data."""
    from database_anonymiser_minimiser_spark.queries import load

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts").limit(300)
    orders = load(spark, sf_dir, "orders")
    merged = {
        r["event_id"]: r["o_orderkey"]
        for r in asof_join(
            ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
            ["o_orderkey"], tiebreak_col="o_orderkey",
        ).collect()
    }
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc_nulls_last()
    )
    naive = {
        r["event_id"]: r["o_orderkey"]
        for r in ev.join(
            orders,
            (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
            "left",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert merged == naive


def test_bucketed_range_join_equals_naive_theta_join(spark, sf_dir):
    """The bucketed equi-join form must return exactly the rows of the
    naive range-predicate join, for bucket sizes smaller AND larger than
    the interval length (boundary replicas are filtered, not dropped)."""
    from database_anonymiser_minimiser_spark.operators.asof import (
        bucketed_range_join,
    )
    from database_anonymiser_minimiser_spark.queries import (
        _range_windows,
        load,
    )

    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    w = _range_windows(spark)
    naive = (
        ev.crossJoin(w)
        .filter((ev.ts >= w.ws) & (ev.ts < w.we))
        .select("event_id", "window_id")
    )
    expected = {(r["event_id"], r["window_id"]) for r in naive.collect()}
    assert expected  # the windows do cover events
    for bucket in (600, 3600, 7 * 24 * 3600):
        got = {
            (r["event_id"], r["window_id"])
            for r in bucketed_range_join(ev, w, "ts", "ws", "we", bucket)
            .select("event_id", "window_id")
            .collect()
        }
        assert got == expected, f"bucket={bucket}"
