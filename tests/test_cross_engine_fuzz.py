"""Cross-engine fuzzing: arbitrary unicode inputs must produce IDENTICAL
results from the Spark and DuckDB renderings of every deterministic faker
and of the SQL-literal escape chain. Inputs are injected as DATA (Spark
createDataFrame / DuckDB parameterised values), never spliced into SQL
text, so the fuzz also exercises exactly what the engine does to real
column values."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_anonymiser_minimiser_spark.dump import (
    duckdb_literal_sql,
    escape_column,
)
from database_anonymiser_minimiser_spark.functions.faker_deterministic import (
    FAKER_FUNCTIONS,
)
from pyspark.sql import functions as F

# exclude surrogates (not encodable); everything else is fair game
TEXT = st.text(
    alphabet=st.characters(exclude_categories=("Cs",)), min_size=0, max_size=60
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@given(st.lists(TEXT, min_size=1, max_size=25, unique=True))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fakers_identical_on_random_strings(spark, duck, samples):
    sdf = spark.createDataFrame([(s,) for s in samples], ["v"])
    exprs = [
        F.expr(spec.sql("spark", "v")).alias(name)
        for name, spec in FAKER_FUNCTIONS.items()
    ]
    spark_rows = {
        r["v"]: tuple(r[n] for n in FAKER_FUNCTIONS)
        for r in sdf.select("v", *exprs).collect()
    }

    duck_exprs = ", ".join(
        spec.sql("duckdb", "v") + f" AS f{i}"
        for i, spec in enumerate(FAKER_FUNCTIONS.values())
    )
    duck.execute("CREATE OR REPLACE TABLE fuzz_in(v VARCHAR)")
    duck.executemany("INSERT INTO fuzz_in VALUES (?)", [(s,) for s in samples])
    duck_rows = {
        row[0]: tuple(row[1:])
        for row in duck.execute(f"SELECT v, {duck_exprs} FROM fuzz_in").fetchall()
    }
    duck.execute("DROP TABLE fuzz_in")
    assert spark_rows == duck_rows


@given(st.lists(TEXT, min_size=1, max_size=25, unique=True))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_escape_chain_identical_on_random_strings(spark, duck, samples):
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"])
    spark_out = {
        r["s"]: r["esc"]
        for r in sdf.select("s", escape_column(F.col("s")).alias("esc")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE fuzz_esc(s VARCHAR)")
    duck.executemany("INSERT INTO fuzz_esc VALUES (?)", [(s,) for s in samples])
    expr = duckdb_literal_sql("s", "varchar")
    duck_out = {
        row[0]: row[1]
        for row in duck.execute(f"SELECT s, {expr} FROM fuzz_esc").fetchall()
    }
    duck.execute("DROP TABLE fuzz_esc")
    assert spark_out == duck_out
