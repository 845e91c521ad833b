"""SQLite integration — the reference's own integration strategy
(sqlite_test.go is its only real-database suite). Uses the A1/A2 fixture
schemas from FIXTURES.md: catalog extraction, FK discovery, type
fidelity (INTEGER->long, REAL->double, TEXT->string, BLOB->bytes,
NULL->None), full export pipeline with anonymisation + retain."""

import sqlite3

import pytest

from database_anonymiser_minimiser_spark import config as C
from database_anonymiser_minimiser_spark.plans.plan import Engine
from database_anonymiser_minimiser_spark.sources.sqlite import SqliteSource

A1_DDL = """
CREATE TABLE users (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  name TEXT NOT NULL,
  email TEXT UNIQUE,
  age INTEGER DEFAULT 0,
  active INTEGER DEFAULT 1
);
CREATE TABLE orders (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  user_id INTEGER NOT NULL,
  amount REAL NOT NULL,
  created_at TEXT,
  FOREIGN KEY (user_id) REFERENCES users(id)
);
CREATE TABLE products (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  name TEXT NOT NULL,
  price REAL
);
CREATE TABLE types_test (
  id INTEGER PRIMARY KEY,
  int_col INTEGER,
  real_col REAL,
  text_col TEXT,
  blob_col BLOB,
  null_col TEXT
);
"""


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("sqlite") / "app.db"
    con = sqlite3.connect(path)
    con.executescript(A1_DDL)
    # seed pattern from sqlite_test.go:280-291
    for i in range(1, 11):
        con.execute(
            "INSERT INTO users (name, email, age) VALUES (?, ?, ?)",
            (f"User{i}", f"user{i}@example.com", 20 + i),
        )
    for i in range(1, 6):
        con.execute(
            "INSERT INTO orders (user_id, amount, created_at) VALUES (?, ?, ?)",
            (i, 10.5 * i, f"2024-01-{i:02d} 10:00:00"),
        )
    con.execute(
        "INSERT INTO types_test VALUES (1, 42, 3.14, 'hello', X'48454C4C4F', NULL)"
    )
    con.commit()
    con.close()
    return str(path)


@pytest.fixture(scope="module")
def source(spark, db_path):
    return SqliteSource(spark, db_path)


def test_catalog_tables_sorted(source):
    assert source.get_tables() == ["orders", "products", "types_test", "users"]


def test_original_ddl_preserved(source):
    ddl = source.get_table_schema("users")
    assert ddl.startswith("CREATE TABLE users")
    assert "AUTOINCREMENT" in ddl  # verbatim, not reconstructed


def test_columns_ordinal_order(source):
    cols = source.get_columns("users")
    assert [c.name for c in cols] == ["id", "name", "email", "age", "active"]
    assert cols[0].data_type.upper() == "INTEGER"


def test_foreign_keys(source):
    fks = source.get_foreign_keys()
    assert any(
        f.table == "orders" and f.referenced_table == "users" and f.column == "user_id"
        for f in fks
    )


def test_row_count(source):
    assert source.get_row_count("users") == 10
    assert source.get_row_count("orders") == 5


def test_type_fidelity(source):
    """sqlite_test.go:456-526: runtime types survive the scan."""
    row = source.read("types_test").collect()[0]
    assert row["int_col"] == 42 and isinstance(row["int_col"], int)
    assert row["real_col"] == 3.14 and isinstance(row["real_col"], float)
    assert row["text_col"] == "hello"
    assert bytes(row["blob_col"]) == b"HELLO"
    assert row["null_col"] is None


def test_empty_table(source):
    df = source.read("products")
    assert df.count() == 0
    assert df.columns == ["id", "name", "price"]


def test_full_export_pipeline(spark, db_path, tmp_path):
    """The reference's flagship path on its own database format: config ->
    anonymise + retain -> topo-ordered dump."""
    cfg = C.Config.from_dict(
        {
            "connection": {"type": "sqlite", "file": db_path},
            "configuration": {
                "users": {
                    "primary_key": "id",
                    "columns": {
                        "email": "{{faker.email}}",
                        "name": "REDACTED",
                        "age": None,
                    },
                },
                "orders": {"retain": 3, "primary_key": "id"},
                "types_test": {"truncate": True},
            },
        }
    )
    eng = Engine(spark, cfg)
    out = tmp_path / "dump.sql"
    stats = eng.export(str(out), db_type="sqlite")
    text = out.read_text()

    assert "PRAGMA foreign_keys = OFF;" in text
    # FK topo order: users section before orders
    assert text.index("-- Table: users") < text.index("-- Table: orders")
    # verbatim DDL in the dump
    assert "AUTOINCREMENT" in text
    # anonymised: originals gone, shapes right
    assert "user1@example.com" not in text
    assert "@example.com" in text  # deterministic faker email
    assert "'REDACTED'" in text
    # age nulled
    assert stats.per_table_rows["users"] == 10
    assert stats.per_table_rows["orders"] == 3  # retain
    assert stats.tables_truncated == 1
    import re

    users_section = text.split("-- Table: users")[1].split("-- Table:")[0]
    assert re.search(r"\(\d+, 'REDACTED', '[0-9a-f]{12}@example\.com', NULL, \d+\)",
                     users_section)


def test_dump_imports_back_into_sqlite(spark, db_path, tmp_path):
    """The ultimate sink fidelity check: the generated dump must execute
    in a FRESH SQLite database and reproduce the anonymised data —
    schema, rows, NULLs, and FK relationships intact (the reference's
    core promise: 'the dump imports cleanly', README.md:3-13)."""
    cfg = C.Config.from_dict(
        {
            "connection": {"type": "sqlite", "file": db_path},
            "configuration": {
                "users": {
                    "primary_key": "id",
                    "columns": {"email": "{{faker.email}}", "age": None},
                },
                "types_test": {"truncate": True},
            },
        }
    )
    out = tmp_path / "roundtrip.sql"
    Engine(spark, cfg).export(str(out), db_type="sqlite")

    fresh = sqlite3.connect(":memory:")
    fresh.executescript(out.read_text())
    assert fresh.execute("SELECT COUNT(*) FROM users").fetchone()[0] == 10
    assert fresh.execute("SELECT COUNT(*) FROM orders").fetchone()[0] == 5
    assert fresh.execute("SELECT COUNT(*) FROM types_test").fetchone()[0] == 0
    emails = [r[0] for r in fresh.execute("SELECT email FROM users").fetchall()]
    assert all(e.endswith("@example.com") and "user" not in e for e in emails)
    assert fresh.execute("SELECT DISTINCT age FROM users").fetchall() == [(None,)]
    # FK joins still resolve after the round trip
    joined = fresh.execute(
        "SELECT COUNT(*) FROM orders o JOIN users u ON o.user_id = u.id"
    ).fetchone()[0]
    assert joined == 5


def test_sync_on_sqlite(spark, db_path):
    cfg = C.Config.from_dict(
        {"connection": {"type": "sqlite", "file": db_path},
         "configuration": {"users": {}}}
    )
    eng = Engine(spark, cfg)
    missing = eng.sync(dry_run=True)
    assert set(missing) == {"orders", "products", "types_test"}


def test_parallel_partitions_export_identical(spark, db_path, tmp_path):
    """connection.partitions > 0 routes scans through the native Spark
    DataSource (rowid-partitioned parallel reads): the exported dump
    must be byte-identical to the driver-side Arrow path's, and the
    scan must actually carry the requested partitioning."""
    base = {
        "configuration": {
            "users": {
                "primary_key": "id",
                "columns": {"email": "{{faker.email}}", "name": "REDACTED"},
            },
            "orders": {"retain": 3, "primary_key": "id"},
        },
    }
    cfg_serial = C.Config.from_dict(
        {"connection": {"type": "sqlite", "file": db_path}, **base}
    )
    cfg_par = C.Config.from_dict(
        {"connection": {"type": "sqlite", "file": db_path, "partitions": 3}, **base}
    )
    eng_par = Engine(spark, cfg_par)
    assert eng_par.source.read("users").rdd.getNumPartitions() == 3
    out_a, out_b = tmp_path / "serial.sql", tmp_path / "parallel.sql"
    Engine(spark, cfg_serial).export(str(out_a), db_type="sqlite")
    eng_par.export(str(out_b), db_type="sqlite")
    import re

    strip_ts = lambda s: re.sub(r"\d{4}-\d{2}-\d{2}T[0-9:+]+", "<ts>", s)  # noqa: E731
    assert strip_ts(out_a.read_text()) == strip_ts(out_b.read_text())
