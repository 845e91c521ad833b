"""SQLite as a native Spark 4 Python DataSource (``spark.read.format``).

The class-based `SqliteSource` (sources/sqlite.py) ingests driver-side
through Arrow — correct, but single-threaded and opaque to Catalyst.
This module registers the same database file as a first-class
DataSource V2 via the public Python DataSource API (pyspark 4.x,
``pyspark.sql.datasource``), which buys three things the class-based
path cannot express:

- **partitioned parallel reads**: the table is split into rowid ranges
  (SQLite's implicit integer PK), one `InputPartition` each, so
  executors scan disjoint slices concurrently instead of one driver
  loop. On a real cluster the .db file must be on storage every
  executor can reach (NFS/object-store copy) — same contract as any
  file-based source;
- **filter pushdown** (`pushFilters`, Spark 4.1 API): supported
  predicates (=, <>, <, <=, >, >=, IS NULL, IS NOT NULL, IN,
  string prefix/suffix/contains) are compiled into the SQLite WHERE
  clause and *removed* from Spark's plan; unsupported ones stay in
  Spark. Less data crosses the Python<->JVM boundary AND SQLite can
  use its own indexes;
- **Arrow-batch transport**: `read()` yields pyarrow RecordBatches
  (BATCH_SIZE rows), not per-row Python tuples.

Column pruning note: the Python DataSource API has no column-pruning
hook yet — the reader materialises the declared schema and Spark
prunes after transport. For wide tables the class-based source's
explicit column list or JDBC remain the leaner path; stated here so
the trade-off is explicit.

Reference parity: this is the reference's integration database
(``internal/database/sqlite.go``) surfaced through Spark's modern
extension point; schema inference mirrors sqlite.go:79-110 via
``PRAGMA table_info`` + affinity rules (shared helper
``_decl_to_spark``).

Usage::

    from database_anonymiser_minimiser_spark.sources.sqlite_datasource import (
        register_sqlite_datasource,
    )
    register_sqlite_datasource(spark)
    df = (spark.read.format("pysqlite")
          .option("path", "/data/app.db").option("table", "users")
          .option("numPartitions", "8").load())
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql import types as T

from .sqlite import _decl_to_spark

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

BATCH_SIZE = 1000  # reference scan batch (driver.go:34-35)


def _q(ident: str) -> str:
    """Quote an identifier the SQLite way (double-quote doubling)."""
    return '"' + ident.replace('"', '""') + '"'


def _sql_literal(v) -> str | None:
    """SQL literal for a pushed filter value; None = not translatable
    (the filter stays in Spark). Untranslatable includes non-finite
    floats (SQLite has no Inf/NaN literal — repr() would be a syntax
    error at scan time) and ints beyond 64 bits (SQLite silently parses
    oversized integer literals as floats, changing comparison
    semantics)."""
    import math

    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int):
        return repr(v) if -(2**63) <= v < 2**63 else None
    if isinstance(v, float):
        return repr(v) if math.isfinite(v) else None
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return None


def _filter_to_sql(f: Filter) -> str | None:
    """One pushed Filter -> a SQLite WHERE fragment, or None if this
    filter shape cannot be expressed (it is then returned to Spark as
    unsupported — correctness never depends on the pushdown)."""
    if isinstance(f, Not):
        inner = _filter_to_sql(f.child)
        return None if inner is None else f"NOT ({inner})"
    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:  # no nested columns in SQLite
        return None
    col = _q(attr[0])
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, In):
        lits = [_sql_literal(v) for v in f.value]
        if not lits or any(x is None for x in lits):
            return None
        return f"{col} IN ({', '.join(lits)})"
    if isinstance(f, (StringStartsWith, StringEndsWith, StringContains)):
        # quote-escape FIRST, then LIKE-escape the wildcard chars
        pat = (
            f.value.replace("'", "''")
            .replace("\\", "\\\\")
            .replace("%", r"\%")
            .replace("_", r"\_")
        )
        shape = {
            StringStartsWith: f"{pat}%",
            StringEndsWith: f"%{pat}",
            StringContains: f"%{pat}%",
        }[type(f)]
        return f"{col} LIKE '{shape}' ESCAPE '\\'"
    ops = {
        EqualTo: "=",
        EqualNullSafe: "IS",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    op = ops.get(type(f))
    if op is None:
        return None
    lit = _sql_literal(f.value)
    if lit is None:
        return None
    return f"{col} {op} {lit}"


@dataclass
class RowidRange(InputPartition):
    """Half-open rowid slice [lo, hi) — disjoint across partitions, so
    the union of partition reads is exactly the table."""

    lo: int
    hi: int


class SqliteReader(DataSourceReader):
    def __init__(self, path: str, table: str, schema: T.StructType, n_parts: int):
        self.path = path
        self.table = table
        self.schema_ = schema
        self.n_parts = max(1, n_parts)
        self.pushed_where: List[str] = []  # populated by pushFilters

    # -- planning (driver side) -------------------------------------------

    def pushFilters(self, filters: List[Filter]) -> List[Filter]:
        # built EAGERLY (not a generator): self.pushed_where must be
        # complete before partitions() runs, whether or not the caller
        # drains the returned unsupported-filter list
        unsupported: List[Filter] = []
        for f in filters:
            frag = _filter_to_sql(f)
            if frag is None:
                unsupported.append(f)  # Spark keeps evaluating it
            else:
                self.pushed_where.append(frag)
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        """Split on rowid min/max. The range query itself applies the
        pushed WHERE, so a selective pushdown also SHRINKS the rowid
        span that gets scanned (partition pruning for free when the
        filter correlates with insertion order)."""
        import contextlib

        where = (
            " WHERE " + " AND ".join(self.pushed_where) if self.pushed_where else ""
        )
        with contextlib.closing(sqlite3.connect(self.path)) as con:
            row = con.execute(
                f"SELECT min(rowid), max(rowid) FROM {_q(self.table)}{where}"
            ).fetchone()
        lo, hi = row
        if lo is None:  # empty table / nothing matches
            return [RowidRange(0, 0)]
        hi += 1  # half-open
        n = min(self.n_parts, hi - lo)
        step = (hi - lo + n - 1) // n
        return [RowidRange(lo + i * step, min(lo + (i + 1) * step, hi)) for i in range(n)]

    # -- execution (executor side) ----------------------------------------

    def read(self, partition: RowidRange) -> Iterator:
        import contextlib

        import pyarrow as pa

        if partition.lo >= partition.hi:
            return
        cols = ", ".join(_q(f.name) for f in self.schema_.fields)
        conds = [f"rowid >= {partition.lo}", f"rowid < {partition.hi}"]
        conds += self.pushed_where
        sql = (
            f"SELECT {cols} FROM {_q(self.table)} WHERE {' AND '.join(conds)} "
            f"ORDER BY rowid"
        )
        arrow_fields = []
        for f in self.schema_.fields:
            pa_type = {
                T.LongType(): pa.int64(),
                T.DoubleType(): pa.float64(),
                T.StringType(): pa.string(),
                T.BinaryType(): pa.binary(),
            }[f.dataType]
            arrow_fields.append(pa.field(f.name, pa_type))
        arrow_schema = pa.schema(arrow_fields)
        with contextlib.closing(sqlite3.connect(self.path)) as con:
            con.text_factory = str
            cur = con.execute(sql)
            while True:
                rows = cur.fetchmany(BATCH_SIZE)
                if not rows:
                    break
                columns = list(zip(*rows))
                arrays = []
                for i, f in enumerate(arrow_fields):
                    vals = columns[i]
                    # SQLite columns are dynamically typed: a TEXT
                    # column can hold stray ints, BLOB can hold
                    # memoryview — coerce to the declared affinity
                    # (same rule as the class-based source) so
                    # pa.array never sees a type it rejects
                    if f.type == pa.binary():
                        vals = [
                            bytes(v)
                            if isinstance(v, (bytes, bytearray, memoryview))
                            else (str(v).encode() if v is not None else None)
                            for v in vals
                        ]
                    elif f.type == pa.string():
                        vals = [
                            v if isinstance(v, str) or v is None else str(v)
                            for v in vals
                        ]
                    arrays.append(pa.array(vals, type=f.type))
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


class SqliteTailReader(SimpleDataSourceStreamReader):
    """Streaming tail of a SQLite table by rowid — CDC-lite ingest for
    the reference's own domain: stream new application-DB rows into
    Spark and mask them in flight (compose with the streaming
    anonymise operator) instead of re-exporting the whole table.

    Offsets are ``{"rowid": N}`` — the highest rowid already emitted —
    so a restart from checkpoint resumes exactly after the last
    committed row, and ``readBetweenOffsets`` replays any batch
    deterministically (rowid is SQLite's stable implicit PK; this
    source assumes the common INSERT-mostly ledger shape — rowid REUSE
    after DELETE, or UPDATEs, are not change events SQLite exposes
    without triggers, and that caveat is documented, not hidden).

    Simple (driver-side) reader by design: a SQLite file's write rate
    is a single-writer stream — exactly the "input rate is small"
    case the Simple API is for. Bulk backfill belongs to the batch
    reader's partitioned path."""

    def __init__(self, path: str, table: str, schema: T.StructType, opts):
        self.path = path
        self.table = table
        self.schema_ = schema
        # offsets are EXCLUSIVE lower bounds ("last emitted rowid").
        # Default must sit below any real rowid: rowid 0 and negatives
        # are legal when an INTEGER PRIMARY KEY supplies them, so the
        # natural-looking 0 default would silently skip row 0
        self.start_rowid = int(opts.get("startingRowid", str(-(2**63))))
        self.max_rows = int(opts.get("maxRowsPerBatch", "10000"))

    def initialOffset(self) -> dict:
        return {"rowid": self.start_rowid}

    def _select(self, lo: int, hi: int | None, limit: int | None):
        import contextlib

        cols = ", ".join(_q(f.name) for f in self.schema_.fields)
        sql = f"SELECT {cols}, rowid FROM {_q(self.table)} WHERE rowid > {lo}"
        if hi is not None:
            sql += f" AND rowid <= {hi}"
        sql += " ORDER BY rowid"
        if limit is not None:
            sql += f" LIMIT {limit}"
        with contextlib.closing(sqlite3.connect(self.path)) as con:
            con.text_factory = str
            return con.execute(sql).fetchall()

    def read(self, start: dict) -> tuple:
        lo = int(start["rowid"])
        rows = self._select(lo, None, self.max_rows)
        if not rows:
            return iter([]), {"rowid": lo}
        end = rows[-1][-1]  # rowid of the last emitted row
        return iter([r[:-1] for r in rows]), {"rowid": int(end)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator:
        rows = self._select(int(start["rowid"]), int(end["rowid"]), None)
        return iter([r[:-1] for r in rows])


class SqliteDataSource(DataSource):
    """format("pysqlite"): options `path` (db file), `table`,
    `numPartitions` (default 4, batch reads). Also readable as a
    STREAM (``spark.readStream.format("pysqlite")``): tails the table
    by rowid with checkpoint-replayable offsets (SqliteTailReader);
    extra stream options `startingRowid`, `maxRowsPerBatch`."""

    @classmethod
    def name(cls) -> str:
        return "pysqlite"

    def _table(self) -> str:
        table = self.options.get("table")
        if not table:
            raise ValueError("pysqlite: option 'table' is required")
        return table

    def schema(self) -> T.StructType:
        import contextlib

        path = self.options.get("path")
        if not path:
            raise ValueError("pysqlite: option 'path' is required")
        with contextlib.closing(sqlite3.connect(path)) as con:
            info = con.execute(
                f"PRAGMA table_info({_q(self._table())})"
            ).fetchall()
        if not info:
            raise ValueError(f"pysqlite: table not found: {self._table()}")
        # PRAGMA table_info: (cid, name, decl_type, notnull, dflt, pk)
        return T.StructType(
            [
                T.StructField(name, _decl_to_spark(decl), not notnull)
                for _cid, name, decl, notnull, _dflt, _pk in info
            ]
        )

    def reader(self, schema: T.StructType) -> SqliteReader:
        return SqliteReader(
            self.options["path"],
            self._table(),
            schema,
            int(self.options.get("numPartitions", "4")),
        )

    def simpleStreamReader(self, schema: T.StructType) -> SqliteTailReader:
        return SqliteTailReader(
            self.options["path"], self._table(), schema, self.options
        )


def register_sqlite_datasource(spark: "SparkSession") -> None:
    """Idempotent registration of the `pysqlite` format. Python-source
    filter pushdown ships behind a flag in Spark 4.1 — a reader that
    implements pushFilters() with the flag off is an analysis-time
    ERROR (not a silent degrade), so registration turns it on."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SqliteDataSource)
