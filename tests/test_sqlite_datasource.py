"""Spark 4 Python DataSource for SQLite: schema inference, partitioned
parallel reads (disjoint rowid ranges), filter pushdown into SQLite SQL
(including adversarial quoting), and fallback of unsupported filters to
Spark."""

import sqlite3

import pytest

from database_anonymiser_minimiser_spark.sources.sqlite_datasource import (
    RowidRange,
    SqliteReader,
    _filter_to_sql,
    register_sqlite_datasource,
)


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pysqlite") / "app.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT,"
        " age INTEGER, score REAL, blob BLOB)"
    )
    rows = [
        (i, f"user_{i:03d}", 20 + i % 50, i * 1.5, bytes([i % 256, 255]))
        for i in range(500)
    ]
    # adversarial strings for the LIKE/quote escaping paths
    rows += [
        (1000, "o'brien", 33, 1.0, None),
        (1001, "100%_done", 44, 2.0, None),
        (1002, "back\\slash", 55, 3.0, None),
        (1003, None, None, None, None),
    ]
    con.executemany("INSERT INTO users VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()
    return path


@pytest.fixture()
def reader_df(spark, db):
    register_sqlite_datasource(spark)
    return (
        spark.read.format("pysqlite")
        .option("path", db)
        .option("table", "users")
        .option("numPartitions", "4")
        .load()
    )


def _ground(db, sql):
    con = sqlite3.connect(db)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_schema_and_full_roundtrip(spark, db, reader_df):
    assert [f.name for f in reader_df.schema.fields] == [
        "id", "name", "age", "score", "blob",
    ]
    assert dict(reader_df.dtypes)["age"] == "bigint"
    assert dict(reader_df.dtypes)["score"] == "double"
    assert dict(reader_df.dtypes)["blob"] == "binary"
    got = sorted(
        (r["id"], r["name"], r["age"], r["score"],
         bytes(r["blob"]) if r["blob"] is not None else None)
        for r in reader_df.collect()
    )
    want = sorted(_ground(db, "SELECT id, name, age, score, blob FROM users"))
    assert got == want


def test_partitions_are_disjoint_and_parallel(spark, db, reader_df):
    assert reader_df.rdd.getNumPartitions() == 4
    # the 4 rowid slices must tile the table exactly: no dupes, no loss
    assert reader_df.count() == 504
    assert reader_df.select("id").distinct().count() == 504


def test_filter_pushdown_results_exact(spark, db, reader_df):
    got = sorted(r["id"] for r in reader_df.filter("age > 60").collect())
    want = sorted(r[0] for r in _ground(db, "SELECT id FROM users WHERE age > 60"))
    assert got == want
    got = sorted(
        r["id"] for r in reader_df.filter("name LIKE 'user_01%'").collect()
    )
    want = sorted(
        r[0] for r in _ground(db, "SELECT id FROM users WHERE id BETWEEN 10 AND 19")
    )
    assert got == want


def test_pushdown_adversarial_strings(spark, db, reader_df):
    import pyspark.sql.functions as F

    assert [r["id"] for r in reader_df.filter(F.col("name") == "o'brien").collect()] == [1000]
    assert [r["id"] for r in reader_df.filter(F.col("name").startswith("100%")).collect()] == [1001]
    assert [r["id"] for r in reader_df.filter(F.col("name").contains("\\")).collect()] == [1002]
    assert [r["id"] for r in reader_df.filter(F.col("name").isNull()).collect()] == [1003]


def test_unsupported_filter_falls_back_to_spark(spark, db, reader_df):
    # upper(name) is not a plain attribute ref: never pushed, still correct
    got = [r["id"] for r in reader_df.filter("upper(name) = 'O''BRIEN'").collect()]
    assert got == [1000]


def test_reader_unit_pushdown_and_partitions(db):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNotNull
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("age", T.LongType()),
    ])
    rd = SqliteReader(db, "users", schema, 4)
    unsupported = list(rd.pushFilters([
        GreaterThan(("age",), 30),
        In(("id",), (1, 2, 3)),
        IsNotNull(("age",)),
        EqualTo(("id",), object()),  # untranslatable literal -> stays in Spark
    ]))
    assert len(unsupported) == 1 and isinstance(unsupported[0], EqualTo)
    assert rd.pushed_where == [
        '"age" > 30', '"id" IN (1, 2, 3)', '"age" IS NOT NULL',
    ]
    parts = rd.partitions()
    assert all(isinstance(p, RowidRange) for p in parts)
    spans = sorted((p.lo, p.hi) for p in parts)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo  # disjoint


def test_like_fragment_escaping():
    from pyspark.sql.datasource import StringContains

    frag = _filter_to_sql(StringContains(("name",), "50%_o'k"))
    assert frag == '"name" LIKE \'%50\\%\\_o\'\'k%\' ESCAPE \'\\\''


def test_empty_match_and_missing_table(spark, db):
    register_sqlite_datasource(spark)
    df = (
        spark.read.format("pysqlite")
        .option("path", db).option("table", "users").load()
        .filter("age > 1000")
    )
    assert df.count() == 0
    with pytest.raises(Exception, match="table not found"):
        (
            spark.read.format("pysqlite")
            .option("path", db).option("table", "nope").load()
        ).collect()


def test_stream_tail_resumes_from_checkpoint(spark, db, tmp_path):
    """Streaming tail: first availableNow run drains the table; rows
    appended AFTER it are the ONLY output of the second run with the
    same checkpoint — offsets ({'rowid': N}) persist and replay."""
    import sqlite3 as s3

    register_sqlite_datasource(spark)
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def drain():
        # parquet sink: the memory sink refuses checkpoint RECOVERY, and
        # resumability is exactly what this test proves
        q = (
            spark.readStream.format("pysqlite")
            .option("path", db).option("table", "users")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["id"] for r in spark.read.parquet(out).collect()}

    first = drain()
    assert len(first) == 504  # the whole table on first run
    con = s3.connect(db)
    con.execute("INSERT INTO users VALUES (2000, 'late_arrival', 99, 9.9, NULL)")
    con.commit()
    con.close()
    second = drain()
    assert second == first | {2000}  # exactly one new row appended


def test_stream_tail_masked_in_flight(spark, db, tmp_path):
    """Compose the tail with the engine's own domain: deterministic
    pseudonymisation applied to the live stream — the reference's
    export loop as CONTINUOUS ingest."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.functions.faker_deterministic import (
        FAKER_FUNCTIONS,
    )

    register_sqlite_datasource(spark)
    stream = (
        spark.readStream.format("pysqlite")
        .option("path", db).option("table", "users").load()
        .select(
            "id",
            F.expr(FAKER_FUNCTIONS["name"].sql("spark", "name")).alias("masked"),
        )
    )
    q = (
        stream.writeStream.format("memory").queryName("tail_masked")
        .option("checkpointLocation", str(tmp_path / "chk2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("tail_masked").collect()
    assert len(rows) >= 504
    originals = {r["masked"] for r in rows}
    assert "user_001" not in originals  # every name rewritten


def test_untranslatable_literals_stay_in_spark(spark, db, reader_df):
    """Non-finite floats and >64-bit ints have no SQLite literal — the
    filter must fall back to Spark, never emit broken SQL."""
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from database_anonymiser_minimiser_spark.sources.sqlite_datasource import (
        _filter_to_sql,
    )

    assert _filter_to_sql(EqualTo(("score",), float("inf"))) is None
    assert _filter_to_sql(EqualTo(("score",), float("nan"))) is None
    assert _filter_to_sql(GreaterThan(("id",), 2**70)) is None
    # end-to-end: the query still answers correctly via Spark-side eval
    import pyspark.sql.functions as F

    assert reader_df.filter(F.col("score") == float("inf")).count() == 0


def test_dynamic_typing_coerced(spark, tmp_path):
    """SQLite's dynamic typing: stray ints in a TEXT column surface as
    strings (declared-affinity rule), not Arrow conversion errors."""
    import sqlite3 as s3

    path = str(tmp_path / "dyn.db")
    con = s3.connect(path)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, label TEXT)")
    con.execute("INSERT INTO t VALUES (1, 'ok')")
    con.execute("INSERT INTO t VALUES (2, 42)")  # int in a TEXT column
    con.commit()
    con.close()
    register_sqlite_datasource(spark)
    got = {
        r["id"]: r["label"]
        for r in (
            spark.read.format("pysqlite")
            .option("path", path).option("table", "t").load()
            .collect()
        )
    }
    assert got == {1: "ok", 2: "42"}


@pytest.fixture(scope="module")
def mixed_db(tmp_path_factory):
    """Mixed-case names + custom-collation twin table: the data that
    exposes SQLite's ASCII-case-insensitive LIKE and NOCASE collation
    if either were wrongly pushed."""
    path = str(tmp_path_factory.mktemp("pysqlite_case") / "case.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE people (id INTEGER PRIMARY KEY, name TEXT)")
    con.executemany(
        "INSERT INTO people VALUES (?,?)",
        [(1, "user_001"), (2, "User_010"), (3, "USER_X"), (4, "other")],
    )
    con.execute(
        "CREATE TABLE people_nc (id INTEGER PRIMARY KEY,"
        " name TEXT COLLATE NOCASE)"
    )
    con.executemany(
        "INSERT INTO people_nc VALUES (?,?)",
        [(1, "abc"), (2, "ABC"), (3, "xyz")],
    )
    con.commit()
    con.close()
    return path


def _read_mixed(spark, path, table):
    register_sqlite_datasource(spark)
    return (
        spark.read.format("pysqlite")
        .option("path", path).option("table", table)
        .option("numPartitions", "2").load()
    )


def test_pushed_like_is_case_sensitive(spark, mixed_db):
    """Pushed String* filters are REMOVED from Spark's plan, so the
    SQLite LIKE they compile to must match Spark's binary semantics —
    PRAGMA case_sensitive_like=ON. Without it, startswith('user_')
    wrongly returns 'User_010'."""
    import pyspark.sql.functions as F

    df = _read_mixed(spark, mixed_db, "people")
    assert [r["id"] for r in df.filter(F.col("name").startswith("user_")).collect()] == [1]
    assert sorted(
        r["id"] for r in df.filter(F.col("name").contains("ser")).collect()
    ) == [1, 2]
    # the silent-row-DROP case from the advisory: NOT(startswith) must
    # keep the differently-cased rows
    assert sorted(
        r["id"] for r in df.filter(~F.col("name").startswith("user_")).collect()
    ) == [2, 3, 4]
    assert [r["id"] for r in df.filter(F.col("name").endswith("_X")).collect()] == [3]


def test_nocase_collation_disables_value_pushdown(spark, mixed_db):
    """A COLLATE NOCASE column makes SQLite's =/< case-insensitive —
    not fixable by pragma — so value-comparing filters must stay in
    Spark (unit: pushFilters returns them; e2e: binary semantics)."""
    from pyspark.sql.datasource import EqualTo, IsNotNull
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    rd = SqliteReader(mixed_db, "people_nc", schema, 2, collation_safe=False)
    unsupported = list(rd.pushFilters([
        EqualTo(("name",), "abc"),
        IsNotNull(("name",)),  # NULL-ness is collation-independent
    ]))
    assert len(unsupported) == 1 and isinstance(unsupported[0], EqualTo)
    assert rd.pushed_where == ['"name" IS NOT NULL']
    # e2e through the registered source: = on the NOCASE column keeps
    # Spark's binary semantics ('abc' matches exactly one row, not 'ABC')
    import pyspark.sql.functions as F

    df = _read_mixed(spark, mixed_db, "people_nc")
    assert [r["id"] for r in df.filter(F.col("name") == "abc").collect()] == [1]
    assert sorted(
        r["id"] for r in df.filter(F.col("name") != "abc").collect()
    ) == [2, 3]


def test_user_schema_unsupported_type_is_descriptive(spark, db):
    """A user-supplied schema with a type SQLite storage cannot carry
    fails at PLANNING time with a message naming the field — not an
    executor-side KeyError."""
    from pyspark.sql import types as T

    register_sqlite_datasource(spark)
    with pytest.raises(Exception, match="unsupported column type.*ts: timestamp"):
        (
            spark.read.format("pysqlite")
            .schema(
                T.StructType([
                    T.StructField("id", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                ])
            )
            .option("path", db).option("table", "users").load()
        ).collect()


def test_user_schema_narrow_numerics_supported(spark, db):
    """IntegerType/FloatType/BooleanType user schemas read through the
    int32/float32/bool Arrow transport."""
    from pyspark.sql import types as T

    register_sqlite_datasource(spark)
    df = (
        spark.read.format("pysqlite")
        .schema(
            T.StructType([
                T.StructField("id", T.IntegerType()),
                T.StructField("age", T.IntegerType()),
                T.StructField("score", T.FloatType()),
            ])
        )
        .option("path", db).option("table", "users").load()
    )
    assert dict(df.dtypes) == {"id": "int", "age": "int", "score": "float"}
    row = {r["id"]: r for r in df.collect()}
    assert row[10]["age"] == 30 and abs(row[10]["score"] - 15.0) < 1e-6


def test_numeric_affinity_coercion(spark, tmp_path):
    """Dynamic typing the other way round: TEXT values stored in
    INTEGER/REAL columns coerce to the declared affinity (SQLite CAST
    semantics — '12.9'->12 for INTEGER); unparseable text raises a
    descriptive error naming table/column, not an opaque ArrowInvalid."""
    import sqlite3 as s3

    path = str(tmp_path / "num.db")
    con = s3.connect(path)
    con.execute("CREATE TABLE m (id INTEGER PRIMARY KEY, n INTEGER, x REAL)")
    con.executemany(
        "INSERT INTO m VALUES (?,?,?)",
        [(1, 7, 1.5), (2, "123", "2.5"), (3, "12.9", 3), (4, None, None)],
    )
    con.commit()
    con.close()
    register_sqlite_datasource(spark)
    df = (
        spark.read.format("pysqlite")
        .option("path", path).option("table", "m").load()
    )
    got = {r["id"]: (r["n"], r["x"]) for r in df.collect()}
    assert got == {1: (7, 1.5), 2: (123, 2.5), 3: (12, 3.0), 4: (None, None)}

    con = s3.connect(path)
    con.execute("INSERT INTO m VALUES (5, 'not-a-number', 0)")
    con.commit()
    con.close()
    with pytest.raises(Exception, match=r"m\.n.*not-a-number|not-a-number.*m\.n"):
        (
            spark.read.format("pysqlite")
            .option("path", path).option("table", "m").load()
        ).collect()


def test_pushed_filter_reaches_sqlite_index(tmp_path):
    """r8 (verdict item 5): the pushdown's value is not Python-side row
    filtering — the pushed fragment lands in SQLite's own WHERE so its
    planner can SEARCH an index. EXPLAIN QUERY PLAN gate over the EXACT
    statements the reader issues (range_sql + scan_sql): both must use
    the index on the pushed column, neither may full-SCAN."""
    from pyspark.sql import types as T
    from pyspark.sql.datasource import EqualTo

    path = str(tmp_path / "idx.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE ev (id INTEGER PRIMARY KEY, age INTEGER, name TEXT)")
    con.execute("CREATE INDEX idx_ev_age ON ev(age)")
    con.executemany(
        "INSERT INTO ev VALUES (?,?,?)",
        [(i, i % 90, f"n{i}") for i in range(5000)],
    )
    con.commit()
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    rd = SqliteReader(path, "ev", schema, 4)
    assert not list(rd.pushFilters([EqualTo(("age",), 30)]))
    parts = rd.partitions()
    plans = [
        " | ".join(r[3] for r in con.execute("EXPLAIN QUERY PLAN " + sql))
        for sql in [rd.range_sql(), rd.scan_sql(parts[0])]
    ]
    con.close()
    for plan in plans:
        assert "idx_ev_age" in plan, plan
        assert "SCAN ev" not in plan, plan
