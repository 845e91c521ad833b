"""apply_changes: MERGE-INTO semantics from Spark primitives."""

from database_anonymiser_minimiser_spark.operators.cdc import apply_changes


def _merged(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, ["k", "v"])
    changes = spark.createDataFrame(change_rows, ["k", "change_type", "v"])
    return {
        r["k"]: r["v"] for r in apply_changes(base, changes, "k").collect()
    }


def test_insert_update_delete(spark):
    got = _merged(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [(2, "update", "B"), (3, "delete", None), (4, "insert", "d")],
    )
    assert got == {1: "a", 2: "B", 4: "d"}


def test_insert_on_existing_key_upserts(spark):
    """Insert whose key exists replaces the base row (last-writer-wins),
    matching MERGE upsert semantics."""
    got = _merged(spark, [(1, "a")], [(1, "insert", "A")])
    assert got == {1: "A"}


def test_empty_feed_is_identity(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame([], "k int, change_type string, v string")
    out = apply_changes(base, changes, "k").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a")]


# --- incremental rollup maintenance ---------------------------------------

from database_anonymiser_minimiser_spark.operators.cdc import maintain_rollup


def _rollup_of(spark, rows):
    """Full recompute: the ground truth the incremental path must match."""
    from collections import Counter

    c = Counter(rows)
    return {k: v for k, v in c.items()}


def test_incremental_rollup_equals_full_recompute(spark):
    """R' = R (+) agg(signed delta) must equal re-aggregating the post-
    change base — including a group deleted down to zero leaving the
    rollup entirely."""
    base_rows = [("a",), ("a",), ("b",), ("c",)]
    base = spark.createDataFrame(base_rows, ["g"])
    rollup = base.groupBy("g").count().withColumnRenamed("count", "n")

    changes = spark.createDataFrame(
        [
            ("a", "insert"),
            ("d", "insert"),
            ("c", "delete"),  # c's only row -> group disappears
            ("b", "delete"),
            ("b", "insert"),  # an update: delete(old)+insert(new), same group
        ],
        ["g", "change_type"],
    )
    got = {
        r["g"]: r["n"]
        for r in maintain_rollup(rollup, changes, ["g"]).collect()
    }
    # post-change base: a,a,a,b,d
    assert got == {"a": 3, "b": 1, "d": 1}


def test_incremental_rollup_empty_feed_identity(spark):
    base = spark.createDataFrame([("x",), ("x",)], ["g"])
    rollup = base.groupBy("g").count().withColumnRenamed("count", "n")
    changes = spark.createDataFrame([], "g string, change_type string")
    got = {r["g"]: r["n"] for r in maintain_rollup(rollup, changes, ["g"]).collect()}
    assert got == {"x": 2}


def test_incremental_rollup_costs_delta_not_corpus(spark):
    """Plan property: maintenance must aggregate the DELTA and the
    existing rollup relation only — the base table never appears (no
    second corpus scan), and the merge is aggregation, not a join."""
    base = spark.createDataFrame([("x",)] * 100, ["g"])
    rollup = base.groupBy("g").count().withColumnRenamed("count", "n")
    changes = spark.createDataFrame([("x", "insert")], ["g", "change_type"])
    out = maintain_rollup(rollup, changes, ["g"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan, plan[:2000]
