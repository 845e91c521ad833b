"""Consistency semantics (reference anonymiser_test.go:174-204): same
original -> same fake across tables; different originals -> different
fakes; the broadcast-join path equals direct application."""

from database_anonymiser_minimiser_spark.operators import consistency as C
from database_anonymiser_minimiser_spark.functions.faker_realistic import (
    realistic_column,
)


def test_mapping_covers_union_of_distincts(spark):
    a = spark.createDataFrame([("x",), ("y",), (None,)], ["c"])
    b = spark.createDataFrame([("y",), ("z",)], ["d"])
    m = C.build_mapping([(a, "c"), (b, "d")])
    rows = {r["original"]: r["fake"] for r in m.collect()}
    assert set(rows) == {"x", "y", "z"}  # null excluded, union deduped
    assert all(v is not None for v in rows.values())


def test_same_original_same_fake_across_tables(spark):
    t1 = spark.createDataFrame([("alice@x.com",), ("bob@y.com",)], ["email"])
    t2 = spark.createDataFrame([("alice@x.com",), ("carol@z.com",)], ["contact"])
    m = C.build_mapping([(t1, "email"), (t2, "contact")])
    r1 = {r["email"] for r in C.apply_mapping(t1, "email", m).collect()}
    r2 = {r["contact"] for r in C.apply_mapping(t2, "contact", m).collect()}
    mapping = {r["original"]: r["fake"] for r in m.collect()}
    assert mapping["alice@x.com"] in r1 and mapping["alice@x.com"] in r2
    # different in -> different out for these values
    assert len(set(mapping.values())) == 3


def test_nulls_stay_null(spark):
    t = spark.createDataFrame([("x",), (None,)], ["c"])
    m = C.build_mapping([(t, "c")])
    vals = [r["c"] for r in C.apply_mapping(t, "c", m).collect()]
    assert None in vals and len(vals) == 2


def test_shuffle_join_mode_same_result(spark):
    t = spark.createDataFrame([(f"v{i}",) for i in range(50)], ["c"])
    m = C.build_mapping([(t, "c")])
    broad = sorted(r["c"] for r in C.apply_mapping(t, "c", m, broadcast=True).collect())
    shuf = sorted(r["c"] for r in C.apply_mapping(t, "c", m, broadcast=False).collect())
    assert broad == shuf


def test_realistic_generator_in_mapping(spark):
    t = spark.createDataFrame([("alice",), ("bob",), ("alice",)], ["name"])
    m = C.build_mapping([(t, "name")], generator=realistic_column("email", "original"))
    rows = {r["original"]: r["fake"] for r in m.collect()}
    assert len(rows) == 2
    assert all("@" in v for v in rows.values())
    # deterministic per value: rebuilding gives the same mapping
    again = {r["original"]: r["fake"] for r in
             C.build_mapping([(t, "name")],
                             generator=realistic_column("email", "original")).collect()}
    assert rows == again


def test_shuffle_join_fallback_no_broadcast_no_collect(spark, sf_dir):
    """Cardinality guard (SURVEY §7.3): when the mapping is too big to
    broadcast, broadcast=False must produce a plan with NO broadcast of
    the mapping side and NO driver collect — a shuffle join (SMJ or AQE's
    shuffled-hash) that scales to any distinct count — and identical
    results to the broadcast plan."""
    from database_anonymiser_minimiser_spark.operators.consistency import (
        apply_mapping,
        build_mapping,
    )
    from database_anonymiser_minimiser_spark.queries import load

    # push the auto-broadcast threshold to zero so even a small mapping
    # exercises the genuine shuffle path the flag is for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cust = load(spark, sf_dir, "customer")
        mapping = build_mapping([(cust, "c_name")])
        out = apply_mapping(cust, "c_name", mapping, broadcast=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

        got = {r["c_custkey"]: r["c_name"] for r in out.collect()}
        want = {
            r["c_custkey"]: r["c_name"]
            for r in apply_mapping(cust, "c_name", mapping, broadcast=True).collect()
        }
        assert got == want
        assert all(v is None or v.endswith("@example.com") for v in got.values())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
