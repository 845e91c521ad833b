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


def test_zorder_export_tightens_both_dims(spark, sf_dir, tmp_path):
    """Z-ordered layout: every output file covers a small rectangle in
    BOTH dimensions, so parquet min/max stats prune files for 2-D
    predicates. Contrast gate: a 1-D sort on the first column leaves the
    second column's per-file span at ~the global span."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from database_anonymiser_minimiser_spark.dump import (
        write_sorted_parquet,
        write_zorder_parquet,
    )
    from database_anonymiser_minimiser_spark.sources.parquet import (
        read_parquet_table,
    )

    orders = read_parquet_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    glob_min, glob_max = orders.selectExpr(
        "min(o_custkey)", "max(o_custkey)"
    ).first()
    p_min, p_max = orders.selectExpr(
        "min(o_totalprice)", "max(o_totalprice)"
    ).first()

    def mean_spans(path):
        c_spans, p_spans = [], []
        for f in Path(path).glob("part-*.parquet"):
            t = pq.read_table(f, columns=["o_custkey", "o_totalprice"])
            if t.num_rows < 2:
                continue
            c = t.column("o_custkey").to_pylist()
            p = t.column("o_totalprice").to_pylist()
            c_spans.append((max(c) - min(c)) / (glob_max - glob_min))
            p_spans.append((max(p) - min(p)) / (p_max - p_min))
        assert len(c_spans) >= 4  # the layout actually split into files
        return sum(c_spans) / len(c_spans), sum(p_spans) / len(p_spans)

    zdir = tmp_path / "zorder"
    write_zorder_parquet(
        orders, zdir, "o_custkey", "o_totalprice", num_partitions=8
    )
    zc, zp = mean_spans(zdir)

    sdir = tmp_path / "sorted1d"
    write_sorted_parquet(orders, sdir, ["o_custkey"], num_partitions=8)
    sc, sp = mean_spans(sdir)

    # 1-D sort: leading column tight, second column ~global
    assert sc < 0.35, sc
    assert sp > 0.8, sp
    # z-order: BOTH columns tight per file
    assert zc < 0.6, zc
    assert zp < 0.6, zp
    # and the z layout loses no rows
    import pyarrow.dataset as ds

    assert ds.dataset(str(zdir)).count_rows() == orders.count()


def test_zvalue_is_nonnegative_true_morton(spark):
    """Regression: the interleave must fold in LONG arithmetic. In a
    32-bit int, b's bit 15 lands on the sign bit (position 31), making
    the upper half of b's range sort NEGATIVE — two swapped half-curves
    instead of one Morton curve. Gate: zvalues are non-negative
    everywhere and strictly increase along the b axis at fixed a."""
    from database_anonymiser_minimiser_spark.dump import zvalue_column

    # a fixed at min (code 0), b sweeping the full range: zvalue must be
    # monotone in b — in particular the b >= mid half must sort AFTER
    # the lower half, not before it
    df = spark.range(0, 256).selectExpr("0 as a", "id * 257 as b")  # b: 0..65535
    with_codes, zcol = zvalue_column(df, "a", "b")
    rows = (
        with_codes.select("b", zcol)
        .orderBy("b")
        .collect()
    )
    zs = [r["zvalue"] for r in rows]
    assert all(z >= 0 for z in zs), min(zs)
    assert zs == sorted(zs)  # monotone along b at fixed a
    # the top code's key uses bit 31: only representable unsigned/long
    assert zs[-1] > (1 << 30)
