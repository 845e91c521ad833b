"""Salted aggregation/join: results must equal the unsalted equivalents
(salting may only change the plan shape, never the answer)."""

import pytest
from pyspark.sql import functions as F

from database_anonymiser_minimiser_spark.operators import skew as S


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [(f"k{i % 50}", i, float(i % 5)) for i in range(100)]
    return spark.createDataFrame(rows, ["key", "n", "v"])


def test_salted_agg_equals_plain(spark, skewed_df):
    plain = {
        (r["key"]): (r["total"], r["cnt"], r["mx"])
        for r in skewed_df.groupBy("key")
        .agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("cnt"),
            F.max("n").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["key"]): (r["total"], r["cnt"], r["mx"])
        for r in S.salted_agg(
            skewed_df,
            ["key"],
            {
                "total": ("sum", "v"),
                "cnt": ("count", None),
                "mx": ("max", "n"),
            },
            salt_buckets=8,
            deterministic_from="n",
        ).collect()
    }
    assert salted == plain


def test_salted_agg_random_salt_equals_plain(spark, skewed_df):
    plain = {
        r["key"]: r["cnt"]
        for r in skewed_df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        r["key"]: r["cnt"]
        for r in S.salted_agg(
            skewed_df, ["key"], {"cnt": ("count", None)}, salt_buckets=4
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark, skewed_df):
    """avg merged by sum would be silently ~buckets-times wrong; the API
    must refuse instead."""
    import pytest

    with pytest.raises(ValueError, match="not decomposable"):
        S.salted_agg(skewed_df, ["key"], {"m": ("avg", "v")})


def test_salted_join_rejects_outer_modes(spark, skewed_df):
    """right/full would emit each unmatched small row once per salt."""
    import pytest

    dim = spark.createDataFrame([("hot", "HOT"), ("ghost", "G")], ["key", "label"])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            S.salted_join(skewed_df, dim, "key", how=how)


def test_salted_join_equals_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["key", "label"]
    )
    plain = sorted(
        tuple(r)
        for r in skewed_df.join(dim, "key").select("key", "n", "label").collect()
    )
    salted = sorted(
        tuple(r)
        for r in S.salted_join(skewed_df, dim, "key", salt_buckets=8,
                               deterministic_from="n")
        .select("key", "n", "label")
        .collect()
    )
    assert salted == plain


def test_salted_join_left_preserves_unmatched(spark, skewed_df):
    dim = spark.createDataFrame([("hot", "HOT")], ["key", "label"])
    out = S.salted_join(
        skewed_df, dim, "key", salt_buckets=4, how="left", deterministic_from="n"
    )
    assert out.count() == skewed_df.count()
    assert out.filter(F.col("label").isNull()).count() == 100  # the tail


def test_salt_distributes_hot_key(spark, skewed_df):
    """The point of salting: the hot key's rows must actually land in
    multiple buckets."""
    salted = skewed_df.withColumn("__salt", S._salt_col(8, "n"))
    buckets = (
        salted.filter(F.col("key") == "hot").select("__salt").distinct().count()
    )
    assert buckets == 8


def test_aqe_splits_skewed_join_at_runtime(spark):
    """PLAN GATE for the runtime half of the skew strategy (session.py
    enables spark.sql.adaptive.skewJoin): a sort-merge join whose big
    side is dominated by one hot key must come out of AQE with the hot
    partition actually SPLIT — `SortMergeJoin(skew=true)` plus an
    `AQEShuffleRead ... skewed` on the hot side — and the answer must
    still be exact. Thresholds are lowered for the toy corpus (the
    defaults are sized for 100 TB partitions) and restored after."""
    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # pinned: the skew decision depends on the shuffle layout (at 32
        # partitions the constant-pad hot partition compresses under the
        # factor x median bar and is NOT split) — and r10 found a
        # get_spark() call mid-suite could leak a different value into
        # the session before this test ran
        "spark.sql.shuffle.partitions": "4",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        n = 400_000
        big = (
            spark.range(n)
            .withColumn(
                "key",
                F.when(F.col("id") % 5 != 0, F.lit(0)).otherwise(F.col("id")),
            )
            .withColumn("pad", F.repeat(F.lit("x"), 40))
        )
        right = (
            spark.range(n)
            .withColumnRenamed("id", "key")
            .withColumn("rv", F.col("key") * 2)
        )
        q = big.join(right, "key").select(F.sum("rv").alias("s"))
        [row] = q.collect()
        # hot key 0 joins rv=0; the tail keys are the multiples of 5
        assert row["s"] == sum(2 * k for k in range(0, n, 5))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert any(
            "AQEShuffleRead" in line and "skewed" in line
            for line in plan.splitlines()
        ), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
