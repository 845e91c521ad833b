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
