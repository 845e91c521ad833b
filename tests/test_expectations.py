"""Single-pass data-quality expectations: correctness of each constraint
plus the plan property that makes them usable at 100 TB — ALL aggregate
checks ride ONE Exchange."""

import re

from pyspark.sql import functions as F

from database_anonymiser_minimiser_spark.operators.expectations import (
    check,
    complete,
    fk_contained,
    in_range,
    member_of,
    min_rows,
    unique,
)


def plan_of(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _results(df):
    return {r["constraint"]: (r["passed"], r["observed"]) for r in df.collect()}


def test_constraints_pass_and_fail_correctly(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 300.0), (3, "d", -1.0)],
        "id long, name string, score double",
    )
    got = _results(
        check(
            df,
            [
                complete("id"),  # pass: no NULL ids
                complete("name"),  # FAIL: one NULL
                unique("name"),  # FAIL: NULL breaks count==distinct
                unique("id"),  # FAIL: 3 twice
                in_range("score", 0, 100),  # FAIL: 300 and -1
                member_of("name", ["a", "b", "d"]),  # pass: NULLs exempt
                min_rows(4),  # pass
                min_rows(5),  # FAIL
            ],
        )
    )
    assert got["complete(id)"][0] is True
    assert got["complete(name)"][0] is False
    assert got["unique(name)"][0] is False
    assert got["unique(id)"][0] is False
    assert got["in_range(score,0,100)"] == (False, 2.0)
    assert got["member_of(name)"][0] is True
    assert got["min_rows(4)"][0] is True
    assert got["min_rows(5)"][0] is False


def test_all_aggregate_checks_cost_one_scan(spark, sf_dir):
    """The whole expectation suite must be ONE aggregation pass over ONE
    scan — a per-constraint scan would multiply the 100 TB read by the
    number of checks. Without a uniqueness check the plan is a single
    Exchange; exact count_distinct inherently adds its own distinct
    pre-reduction stage (one extra Exchange, still one scan)."""
    from database_anonymiser_minimiser_spark.queries import load

    df = load(spark, sf_dir, "customer")
    exps = [
        complete("c_custkey"),
        in_range("c_acctbal", -1000.0, 10000.0),
        member_of(
            "c_mktsegment",
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        ),
        min_rows(1),
    ]
    plan = plan_of(check(df, exps))
    assert len(set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))) == 1, plan[:3000]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]
    assert "Join" not in plan, plan[:3000]

    out = check(df, exps + [unique("c_custkey")])
    plan = plan_of(out)
    assert len(set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))) == 1, plan[:3000]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan[:3000]
    assert all(r["passed"] for r in out.collect())


def test_fk_containment(spark, sf_dir):
    from database_anonymiser_minimiser_spark.queries import load

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    ok = fk_contained(orders, "o_custkey", customer, "c_custkey").collect()[0]
    assert ok["passed"] is True and ok["observed"] == 0.0

    # breaking referential integrity must be caught
    broken = orders.withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(10_000_000)
    )
    bad = fk_contained(broken, "o_custkey", customer, "c_custkey").collect()[0]
    assert bad["passed"] is False and bad["observed"] > 0


def test_checks_on_empty_relation_are_vacuously_true(spark):
    """Aggregates over zero rows return NULL; every check must coalesce
    to a real observed value (an empty table crashed the audit's
    formatting before) and pass vacuously — except min_rows, which is
    exactly the check that must FAIL on empty."""
    df = spark.createDataFrame([], "id long, name string, score double")
    got = _results(
        check(
            df,
            [
                complete("name"),
                unique("id"),
                in_range("score", 0, 1),
                member_of("name", ["a"]),
                min_rows(1),
            ],
        )
    )
    for c, (passed, observed) in got.items():
        assert observed is not None, c
        if c == "min_rows(1)":
            assert passed is False
        else:
            assert passed is True, c


def test_check_quote_safe_names_and_duplicate_rejection(spark):
    """Constraint names are data, not SQL text: a name containing a
    single quote must survive verbatim (the old named_struct string
    interpolation produced a malformed literal), and duplicate names
    are rejected up front (the passed-dispatch would silently apply the
    last predicate to both rows)."""
    import pytest

    from database_anonymiser_minimiser_spark.operators.expectations import (
        Expectation,
        check,
        complete,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,)], ["`it's a col`".strip("`")])
    quoted = Expectation(
        "complete(it's a col)",
        F.coalesce(
            F.avg(F.when(F.col("`it's a col`").isNull(), 1.0).otherwise(0.0)),
            F.lit(0.0),
        ),
        lambda o: o == 0.0,
    )
    rows = check(df, [quoted]).collect()
    assert rows[0]["constraint"] == "complete(it's a col)"
    assert rows[0]["passed"] is True

    with pytest.raises(ValueError, match="duplicate"):
        check(df, [quoted, quoted])


def test_quality_block_parse_validation():
    """Load-time validation of the config quality block: friendly
    errors for every malformed shape, compiled Expectation lists for
    the valid one."""
    import pytest

    from database_anonymiser_minimiser_spark.operators.expectations import (
        QualityConfigError,
        parse_quality_block,
    )

    # build=False: the FULL validation with zero Spark involvement —
    # the exact path config load takes before any session exists
    ok = parse_quality_block(
        {
            "orders": [
                {"check": "complete", "column": "o_orderkey"},
                {"check": "unique", "column": "o_orderkey"},
                {"check": "in_range", "column": "o_totalprice",
                 "lo": 0, "hi": 600000},
                {"check": "member_of", "column": "o_orderstatus",
                 "allowed": ["O", "F", "P"]},
                {"check": "min_rows", "n": 100},
            ]
        },
        build=False,
    )
    assert ok["orders"] == [
        "complete(o_orderkey)", "unique(o_orderkey)",
        "in_range(o_totalprice,0.0,600000.0)",
        "member_of(o_orderstatus)",
        "min_rows(100)",
    ]
    for bad, match in [
        ({}, "non-empty mapping"),
        ({"t": []}, "non-empty list"),
        ({"t": ["x"]}, "must be a mapping"),
        ({"t": [{"check": "nope"}]}, "check must be one of"),
        ({"t": [{"check": "complete"}]}, "requires 'column'"),
        ({"t": [{"check": "in_range", "column": "c"}]}, "'lo' and 'hi'"),
        ({"t": [{"check": "member_of", "column": "c"}]}, "'allowed'"),
        ({"t": [{"check": "min_rows", "n": 0}]}, "n >= 1"),
        ({"t": [{"check": "complete", "column": "c"},
                {"check": "complete", "column": "c"}]}, "duplicate"),
    ]:
        with pytest.raises(QualityConfigError, match=match):
            parse_quality_block(bad, build=False)


def test_audit_verb_runs_quality_contracts(tmp_path, capsys):
    """r13: a config quality block runs inside the audit verb as extra
    PASS/FAIL rows — passing contracts PASS, a violated range FAILs
    with the observed count, and the verb exits 1."""
    from database_anonymiser_minimiser_spark import config as config_mod
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "q.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {orders: {primary_key: o_orderkey}}\n"
        "quality:\n"
        "  orders:\n"
        "    - {check: complete, column: o_orderkey}\n"
        "    - {check: unique, column: o_orderkey}\n"
        "    - {check: in_range, column: o_totalprice, lo: 0, hi: 1}\n"
        "    - {check: member_of, column: o_orderstatus,\n"
        "       allowed: [O, F, P]}\n"
        "    - {check: min_rows, n: 100}\n"
    )
    rc = main(["-c", str(cfg), "audit"])
    out, err = capsys.readouterr()
    assert rc == 1  # the absurd range fails
    assert "PASS  orders: complete(o_orderkey) (observed=0)" in out
    assert "PASS  orders: unique(o_orderkey) (observed=0)" in out
    assert "FAIL  orders: in_range(o_totalprice,0.0,1.0) (observed=1500)" in out
    assert "PASS  orders: member_of(o_orderstatus) (observed=0)" in out
    assert "PASS  orders: min_rows(100) (observed=1500)" in out
    # a typo'd contract fails at LOAD with a friendly ConfigError
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "quality:\n  orders:\n    - {check: nope, column: c}\n"
    )
    import pytest

    with pytest.raises(config_mod.ConfigError, match="check must be"):
        config_mod.load(bad)
    # round-trips through save
    loaded = config_mod.load(cfg)
    out_path = tmp_path / "rt.yaml"
    loaded.save(out_path)
    assert config_mod.load(out_path).quality == loaded.quality


def test_audit_quality_bad_table_or_column_is_friendly(tmp_path, capsys):
    """A typo'd table or column in the quality block takes the clean
    error/exit-2 path, never a traceback."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "q.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "quality:\n  no_such_table:\n"
        "    - {check: min_rows, n: 1}\n"
    )
    rc = main(["-c", str(cfg), "audit"])
    _, err = capsys.readouterr()
    assert rc == 2 and "error: quality.no_such_table" in err
    assert "Traceback" not in err
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "quality:\n  orders:\n"
        "    - {check: complete, column: no_such_column}\n"
    )
    rc = main(["-c", str(cfg), "audit"])
    _, err = capsys.readouterr()
    assert rc == 2 and "error: quality.orders" in err
    assert "Traceback" not in err
