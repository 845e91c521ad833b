"""Cross-engine determinism: every faker function must produce the SAME
value in Spark SQL and DuckDB for the same input — this is what makes the
driver's DuckDB oracle able to verify anonymisation end-to-end.

Also covers the reference's faker behavioral specs
(``internal/anonymiser/faker_test.go``): shape regexes (email/uuid/ipv4/
date/8-digit number), consistency (same in -> same out), and variety
(different in -> usually different out)."""

import re

import duckdb
import pytest

from database_anonymiser_minimiser_spark.functions.faker_deterministic import (
    FAKER_FUNCTIONS,
)

SAMPLES = [
    "Customer#000000001",
    "alice@example.com",
    "O'Brien",          # quoting
    "",                 # empty string original
    "42",
    "Zürich — ünïcode", # non-ascii
    "a b  c\tmulti ws",
]

SHAPES = {
    "email": re.compile(r"^[0-9a-f]{12}@example\.com$"),
    "uuid": re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"),
    "ipv4": re.compile(r"^(\d{1,3}\.){3}\d{1,3}$"),
    "date": re.compile(r"^\d{4}-\d{2}-\d{2}$"),
    "number": re.compile(r"^\d{8}$"),
    "password": re.compile(r"^[0-9a-f]{32}$"),
    "phone": re.compile(r"^555-\d{3}-\d{4}$"),
}


@pytest.fixture(scope="module")
def engines(spark):
    con = duckdb.connect()
    yield spark, con
    con.close()


@pytest.mark.parametrize("fname", sorted(FAKER_FUNCTIONS))
def test_spark_duckdb_parity(engines, fname):
    spark, con = engines
    spec = FAKER_FUNCTIONS[fname]
    for sample in SAMPLES:
        lit = "'" + sample.replace("'", "''") + "'"
        spark_val = spark.sql(f"SELECT {spec.sql('spark', lit)} AS v").collect()[0][0]
        duck_val = con.sql(f"SELECT {spec.sql('duckdb', lit)} AS v").fetchone()[0]
        assert spark_val == duck_val, (fname, sample, spark_val, duck_val)


@pytest.mark.parametrize("fname,shape", sorted(SHAPES.items()))
def test_shapes(engines, fname, shape):
    spark, _ = engines
    spec = FAKER_FUNCTIONS[fname]
    exprs = ", ".join(
        spec.sql("spark", f"'in{i}'") + f" AS v{i}" for i in range(20)
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    for v in row:
        assert shape.match(v), (fname, v)


def test_ipv4_octets_in_range(engines):
    spark, _ = engines
    spec = FAKER_FUNCTIONS["ipv4"]
    exprs = ", ".join(spec.sql("spark", f"'x{i}'") + f" AS v{i}" for i in range(50))
    for v in spark.sql(f"SELECT {exprs}").collect()[0]:
        assert all(0 <= int(o) <= 255 for o in v.split("."))


def test_text_is_sentence(engines):
    spark, _ = engines
    spec = FAKER_FUNCTIONS["text"]
    seed_lit = "'seed'"
    v = spark.sql(f"SELECT {spec.sql('spark', seed_lit)} AS v").collect()[0][0]
    assert v.endswith(".") and len(v.split(" ")) == 10 and v[0].isupper()


def test_consistency_and_variety(engines):
    """Same original -> same fake; 100 distinct originals -> mostly
    distinct fakes (faker_test.go:179-205 uniqueness spirit)."""
    spark, _ = engines
    spec = FAKER_FUNCTIONS["email"]
    same_lit = "'same'"
    a = spark.sql(f"SELECT {spec.sql('spark', same_lit)} AS v").collect()[0][0]
    b = spark.sql(f"SELECT {spec.sql('spark', same_lit)} AS v").collect()[0][0]
    assert a == b
    vals = {
        spark.sql(f"SELECT {spec.sql('spark', repr('in%d' % i))} AS v").collect()[0][0]
        for i in range(0, 100, 10)
    }
    assert len(vals) == 10


def test_null_propagates(engines):
    spark, con = engines
    for fname in ("email", "name", "date", "ipv4"):
        spec = FAKER_FUNCTIONS[fname]
        assert spark.sql(f"SELECT {spec.sql('spark', 'NULL')} AS v").collect()[0][0] is None
        assert con.sql(f"SELECT {spec.sql('duckdb', 'NULL')} AS v").fetchone()[0] is None
