"""write_sorted_parquet: global order via range partitioning — every
file internally sorted, file key-ranges disjoint and ordered, and the
plan is a range exchange, never a single-partition global sort."""

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from database_anonymiser_minimiser_spark.dump import write_sorted_parquet


def test_sorted_export_global_order(spark, sf_dir, tmp_path):
    from database_anonymiser_minimiser_spark.queries import load

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = tmp_path / "orders_sorted"
    write_sorted_parquet(orders, out, sort_by=["o_orderkey"], num_partitions=4)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1  # actually range-partitioned, not one blob
    ranges = []
    total = 0
    for f in files:
        keys = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        if not keys:
            continue
        assert keys == sorted(keys), f  # sorted within file
        ranges.append((keys[0], keys[-1]))
        total += len(keys)
    # part-file name order == key order: ranges are disjoint and ascending
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo
    assert total == orders.count()


def test_sorted_export_plan_is_range_exchange(spark, sf_dir):
    """The shape write_sorted_parquet executes must be a RangePartitioning
    exchange + in-partition sort (global=False) — a single-partition
    global Sort would serialize the whole export through one task."""
    from database_anonymiser_minimiser_spark.queries import load

    orders = load(spark, sf_dir, "orders")
    shaped = orders.repartitionByRange(4, F.col("o_orderkey")).sortWithinPartitions(
        "o_orderkey"
    )
    plan = shaped._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan[:2000]
    # `Sort [...], false, 0` = in-partition sort (global flag false)
    assert "Sort [o_orderkey" in plan and "], false, 0" in plan, plan[:2000]
