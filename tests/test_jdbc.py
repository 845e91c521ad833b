"""JDBC source plumbing at the SQL-string level (no database in this
environment — SURVEY §5: MySQL/Postgres have no integration tests in the
reference either; SQLite/parquet is the integration proxy)."""

from database_anonymiser_minimiser_spark.config import Connection
from database_anonymiser_minimiser_spark.sources import jdbc as J


def test_jdbc_urls():
    assert (
        J.jdbc_url(Connection(type="mysql", host="h", port=3307, database_name="db"))
        == "jdbc:mysql://h:3307/db"
    )
    assert (
        J.jdbc_url(Connection(type="mysql", host="h", database_name="db"))
        == "jdbc:mysql://h:3306/db"
    )  # default port (config.go:240-257)
    assert (
        J.jdbc_url(Connection(type="postgres", host="h", database_name="db"))
        == "jdbc:postgresql://h:5432/db"
    )
    assert J.jdbc_url(Connection(type="sqlite", file="/x.db")) == "jdbc:sqlite:/x.db"


def test_quote_identifier_doubling():
    # mysql.go:237-240 backtick doubling; postgres.go:288-291 quote doubling
    assert J.quote_identifier("mysql", "ta`ble") == "`ta``ble`"
    assert J.quote_identifier("postgres", 'ta"ble') == '"ta""ble"'
    assert J.quote_identifier("sqlite", "t") == '"t"'


def test_list_tables_sql_shapes():
    my = J.list_tables_sql("mysql", "mydb")
    assert "information_schema.tables" in my and "BASE TABLE" in my
    assert "ORDER BY table_name" in my
    pg = J.list_tables_sql("postgres")
    assert "pg_catalog.pg_tables" in pg
    sq = J.list_tables_sql("sqlite")
    assert "sqlite_master" in sq and "NOT LIKE 'sqlite_%'" in sq


def test_foreign_keys_sql_shapes():
    my = J.foreign_keys_sql("mysql", "mydb")
    assert "referenced_table_name IS NOT NULL" in my
    pg = J.foreign_keys_sql("postgres")
    assert "FOREIGN KEY" in pg and "constraint_column_usage" in pg
