"""JDBC source: MySQL / PostgreSQL / SQLite over Spark's JDBC reader.

Mirrors the reference drivers (``internal/database/mysql.go`` /
``postgres.go`` / ``sqlite.go``) Spark-first: instead of hand-streaming
cursor batches (mysql.go:180-222), we hand Spark a JDBC relation and let
it push projections and the retain-date predicate down to the database
(the reference's only pushdowns, mysql.go:150-166, are Catalyst-native
over JDBC).

DSN construction mirrors ``config.go:240-273``. Catalog queries
(information_schema / PRAGMA) mirror mysql.go:44-135 and are issued
through the same JDBC channel with ``dbtable=(subquery)``.

This environment has no JDBC driver jars or reachable databases, so this
module is exercised by unit tests only at the SQL-string level; the
ParquetSource (sources/parquet.py) is the integration-tested source, the
same role SQLite plays for the reference's tests (SURVEY.md section 5).

Scale note: ``partition_column``/``num_partitions`` map to Spark's
parallel JDBC reads — the reference is single-cursor sequential
(exporter.go:72-80); here a big table fans out across executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..config import Connection

_JDBC_DRIVERS = {
    "mysql": "com.mysql.cj.jdbc.Driver",
    "postgres": "org.postgresql.Driver",
    "sqlite": "org.sqlite.JDBC",
}


def jdbc_url(conn: Connection) -> str:
    """JDBC DSN from connection config (mirrors config.go:240-273)."""
    if conn.type == "mysql":
        port = conn.port or 3306
        return f"jdbc:mysql://{conn.host}:{port}/{conn.database_name}"
    if conn.type == "postgres":
        port = conn.port or 5432
        return f"jdbc:postgresql://{conn.host}:{port}/{conn.database_name}"
    if conn.type == "sqlite":
        return f"jdbc:sqlite:{conn.file}"
    raise ValueError(f"unsupported jdbc connection type: {conn.type}")


def quote_identifier(conn_type: str, ident: str) -> str:
    """SQL-injection-safe identifier quoting (mysql.go:237-240 backtick
    doubling; postgres.go:288-291 / sqlite.go:251-254 quote doubling)."""
    if conn_type == "mysql":
        return "`" + ident.replace("`", "``") + "`"
    return '"' + ident.replace('"', '""') + '"'


def list_tables_sql(conn_type: str, database: str = "") -> str:
    """Catalog query for base tables, sorted (mysql.go:44-47,
    postgres.go:44-49, sqlite.go:42-47)."""
    if conn_type == "mysql":
        return (
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{database}' AND table_type = 'BASE TABLE' "
            "ORDER BY table_name"
        )
    if conn_type == "postgres":
        return (
            "SELECT tablename AS table_name FROM pg_catalog.pg_tables "
            "WHERE schemaname = 'public' ORDER BY tablename"
        )
    return (
        "SELECT name AS table_name FROM sqlite_master "
        "WHERE type = 'table' AND name NOT LIKE 'sqlite_%' ORDER BY name"
    )


def foreign_keys_sql(conn_type: str, database: str = "") -> str:
    """FK catalog query (mysql.go:108-117, postgres.go:153-168)."""
    if conn_type == "mysql":
        return (
            "SELECT table_name, column_name, referenced_table_name, "
            "referenced_column_name FROM information_schema.key_column_usage "
            f"WHERE table_schema = '{database}' AND referenced_table_name IS NOT NULL "
            "ORDER BY table_name, ordinal_position"
        )
    if conn_type == "postgres":
        return (
            "SELECT tc.table_name, kcu.column_name, "
            "ccu.table_name AS referenced_table_name, "
            "ccu.column_name AS referenced_column_name "
            "FROM information_schema.table_constraints tc "
            "JOIN information_schema.key_column_usage kcu "
            "ON tc.constraint_name = kcu.constraint_name "
            "JOIN information_schema.constraint_column_usage ccu "
            "ON tc.constraint_name = ccu.constraint_name "
            "WHERE tc.constraint_type = 'FOREIGN KEY' "
            "ORDER BY tc.table_name, kcu.ordinal_position"
        )
    raise ValueError("sqlite FKs use PRAGMA foreign_key_list, issued per table")


@dataclass
class JdbcSource:
    """Reads tables over JDBC with optional parallel partitioned scans."""

    spark: SparkSession
    conn: Connection
    fetch_size: int = 1000  # reference batch size (exporter.go:16-17)

    def _reader(self):
        r = (
            self.spark.read.format("jdbc")
            .option("url", jdbc_url(self.conn))
            .option("driver", _JDBC_DRIVERS[self.conn.type])
            .option("fetchsize", str(self.fetch_size))
        )
        if self.conn.username:
            r = r.option("user", self.conn.username)
        if self.conn.password:
            r = r.option("password", self.conn.password)
        return r

    def read(
        self,
        table: str,
        partition_column: str | None = None,
        num_partitions: int = 8,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
    ) -> DataFrame:
        r = self._reader().option(
            "dbtable", quote_identifier(self.conn.type, table)
        )
        if partition_column is not None:
            r = (
                r.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
                .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
            )
        return r.load()

    def query(self, sql: str) -> DataFrame:
        return self._reader().option("query", sql).load()
