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
