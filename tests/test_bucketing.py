"""Bucketed tables: pre-shuffling data ONCE at write time so repeated
joins/aggregations on the bucket key run with NO exchange. This is the
100 TB pattern for fact-to-fact joins (orders |x| lineitem) that are run
many times — the one sort-merge shuffle in the Q5 star becomes a map-side
zip of co-located buckets."""

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    from database_anonymiser_minimiser_spark.queries import load

    warehouse = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).option("path", str(warehouse / "b_orders")).mode("overwrite").saveAsTable(
        "b_orders"
    )
    load(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).option("path", str(warehouse / "b_lineitem")).mode("overwrite").saveAsTable(
        "b_lineitem"
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def plan_of(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    # disable auto-broadcast so the shuffle-vs-bucket distinction shows
    # (at test SF the small side would broadcast and hide it)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        plan = plan_of(joined)
        # the join itself needs NO Exchange: both sides read pre-bucketed
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct(spark, sf_dir, bucketed):
    from database_anonymiser_minimiser_spark.queries import load

    orders, lineitem = bucketed
    got = {
        r["o_orderstatus"]: r["n"]
        for r in orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    o, l = load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    want = {
        r["o_orderstatus"]: r["n"]
        for r in o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_write_bucketed_table_survives_stale_location(spark, sf_dir):
    """A managed table's warehouse directory can outlive the in-memory
    catalog that tracked it (new session, old spark-warehouse on disk);
    saveAsTable then refuses with LOCATION_ALREADY_EXISTS. The writer
    must clear both the catalog entry and the stale directory so the
    layout write is idempotent across sessions AND within one."""
    from pathlib import Path
    from urllib.parse import urlparse

    from database_anonymiser_minimiser_spark.dump import write_bucketed_table
    from database_anonymiser_minimiser_spark.queries import load

    spark.sql("DROP TABLE IF EXISTS bkt_stale_test")
    wh = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    stale = wh / "bkt_stale_test"
    stale.mkdir(parents=True, exist_ok=True)
    (stale / "junk.parquet").write_text("not parquet")

    df = load(spark, sf_dir, "region")
    write_bucketed_table(df, "bkt_stale_test", "r_regionkey", 2)
    assert spark.table("bkt_stale_test").count() == df.count()
    # second write in the SAME session must also succeed (overwrite)
    write_bucketed_table(df, "bkt_stale_test", "r_regionkey", 2)
    assert spark.table("bkt_stale_test").count() == df.count()
    spark.sql("DROP TABLE IF EXISTS bkt_stale_test")
