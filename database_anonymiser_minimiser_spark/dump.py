"""SQL-dump sink: dialect headers, DDL, batched INSERT text, escaping.

Re-expresses the reference exporter (``internal/exporter/exporter.go``)
Spark-first. The reference formats each row in a Go loop
(``formatValue``/``escapeString``, exporter.go:312-349) and writes
1000-row multi-INSERT statements (exporter.go:273-306) through a 64 KiB
buffered writer, one table at a time (exporter.go:72-80).

Here the hot path — per-value SQL-literal formatting + escaping + row
tuple assembly — is built from JVM column expressions (replace/concat/
date_format), so a 100 TB table formats inside WholeStageCodegen across
all executors; Python only assembles the ordered file from per-table
iterators (header -> tables in FK-topo order -> footer), streaming via
``toLocalIterator`` so the driver never materialises a table.

Output format parity (checked by tests against reference-derived goldens):
- escaping: backslash doubling first, then ``'``->``''``, NUL->``\\0``,
  LF->``\\n``, CR->``\\r``, ^Z->``\\Z`` (exporter.go:339-349),
- values: NULL / bool as 1|0 / ints verbatim / floats shortest-form /
  strings+timestamps escaped-quoted, timestamps as
  ``YYYY-MM-DD HH:MM:SS`` (exporter.go:312-336),
- statements: ``INSERT INTO `t` (`c1`, `c2`) VALUES\\n(v, v),\\n(v, v);``
  batches of <=1000 rows (exporter.go:273-306),
- headers/footers + DROP TABLE per dialect (exporter.go:91-166, 259-271).

Scale note: a single ordered text file is inherently a sequential sink —
the parquet/delta writer (``write_parquet``) is the native alternative for
cluster-scale output; the SQL-text path still computes distributed and
only serialises the final concatenation.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import IO, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

DEFAULT_BATCH_SIZE = 1000  # rows per multi-row INSERT (exporter.go:16-17)

# ---------------------------------------------------------------------------
# Pure-Python mirrors of the reference's formatting (golden-tested; used for
# driver-side formatting and as the spec for the JVM expressions below).
# ---------------------------------------------------------------------------

_ESCAPES = [
    ("\\", "\\\\"),
    ("'", "''"),
    ("\x00", "\\0"),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\x1a", "\\Z"),
]


def escape_string(s: str) -> str:
    """SQL string escaping, reference-exact (exporter.go:339-349)."""
    for old, new in _ESCAPES:
        s = s.replace(old, new)
    return f"'{s}'"


def format_float(v: float) -> str:
    """Go ``%v`` shortest-form float (exporter.go:325-326)."""
    if v != v or v in (float("inf"), float("-inf")):
        return str(v)
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def format_value(v: object) -> str:
    """SQL literal for one runtime value (exporter.go:312-336)."""
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return format_float(v)
    if isinstance(v, (bytes, bytearray)):
        return escape_string(bytes(v).decode("utf-8", errors="replace"))
    if isinstance(v, datetime.datetime):
        return escape_string(v.strftime("%Y-%m-%d %H:%M:%S"))
    if isinstance(v, datetime.date):
        return escape_string(v.strftime("%Y-%m-%d"))
    if isinstance(v, str):
        return escape_string(v)
    return escape_string(str(v))


# ---------------------------------------------------------------------------
# JVM-side (distributed) formatting expressions
# ---------------------------------------------------------------------------


def escape_column(c: Column) -> Column:
    """The escape chain as JVM expressions — order matters (backslash
    first), exactly as exporter.go:339-349."""
    for old, new in _ESCAPES:
        c = F.replace(c, F.lit(old), F.lit(new))
    return F.concat(F.lit("'"), c, F.lit("'"))


def sql_literal_column(df: DataFrame, name: str) -> Column:
    """Column -> its SQL-literal text, per type (exporter.go:312-336)."""
    dt = df.schema[name].dataType
    c = F.col(f"`{name}`")
    if isinstance(dt, T.BooleanType):
        lit = F.when(c, F.lit("1")).otherwise(F.lit("0"))
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        lit = c.cast("string")
    elif isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        # shortest-form-ish: strip a trailing ".0" so whole doubles print
        # like Go %v (3.0 -> 3); plain decimals are unchanged
        lit = F.regexp_replace(c.cast("string"), r"\.0$", "")
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        lit = escape_column(F.date_format(c, "yyyy-MM-dd HH:mm:ss"))
    elif isinstance(dt, T.DateType):
        lit = escape_column(F.date_format(c, "yyyy-MM-dd"))
    elif isinstance(dt, T.BinaryType):
        lit = escape_column(c.cast("string"))
    elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        lit = escape_column(F.to_json(c))
    else:
        lit = escape_column(c.cast("string"))
    return F.when(c.isNull(), F.lit("NULL")).otherwise(lit)


def duckdb_literal_sql(name: str, duck_type: str) -> str:
    """Oracle-side mirror of ``sql_literal_column`` (DuckDB SQL) so the
    dump formatter itself is correctness-gated."""
    q = f'"{name}"'
    esc = q
    # same chain; chr() avoids literal control characters in SQL text
    esc = f"replace({esc}, chr(92), chr(92) || chr(92))"
    esc = f"replace({esc}, chr(39), chr(39) || chr(39))"
    esc = f"replace({esc}, chr(0), chr(92) || '0')"
    esc = f"replace({esc}, chr(10), chr(92) || 'n')"
    esc = f"replace({esc}, chr(13), chr(92) || 'r')"
    esc = f"replace({esc}, chr(26), chr(92) || 'Z')"
    t = duck_type.lower()
    if t in ("boolean",):
        lit = f"CASE WHEN {q} THEN '1' ELSE '0' END"
    elif t in ("tinyint", "smallint", "integer", "bigint", "hugeint"):
        lit = f"CAST({q} AS VARCHAR)"
    elif t in ("real", "float", "double") or t.startswith("decimal"):
        lit = f"regexp_replace(CAST({q} AS VARCHAR), '\\.0$', '')"
    elif t.startswith("timestamp"):
        inner = f"strftime({q}, '%Y-%m-%d %H:%M:%S')"
        lit = f"concat(chr(39), {inner}, chr(39))"  # timestamps never contain escapables
    elif t == "date":
        inner = f"strftime({q}, '%Y-%m-%d')"
        lit = f"concat(chr(39), {inner}, chr(39))"
    else:
        lit = f"concat(chr(39), {esc}, chr(39))"
    return f"CASE WHEN {q} IS NULL THEN 'NULL' ELSE {lit} END"


def row_tuple_column(df: DataFrame) -> Column:
    """``(v1, v2, ...)`` text for each row, all JVM-side."""
    parts: list[Column] = []
    for i, name in enumerate(df.columns):
        if i:
            parts.append(F.lit(", "))
        parts.append(sql_literal_column(df, name))
    return F.concat(F.lit("("), *parts, F.lit(")"))


def quote_ident(db_type: str, ident: str) -> str:
    """Per-dialect identifier quoting (backtick doubling for MySQL,
    quote doubling for postgres/sqlite — mysql.go:237-240,
    postgres.go:288-291, sqlite.go:251-254)."""
    if db_type == "mysql":
        return "`" + ident.replace("`", "``") + "`"
    return '"' + ident.replace('"', '""') + '"'


def insert_statements(
    df: DataFrame,
    table: str,
    order_by: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    db_type: str = "mysql",
) -> DataFrame:
    """DataFrame of one ``stmt`` string column: multi-row INSERTs of
    ``batch_size`` rows (exporter.go:273-306).

    Tuple formatting is distributed; only batching into numbered groups
    needs a global row order. With ``order_by`` (pk) the order is
    deterministic; without, source order is preserved like the reference
    (which is likewise order-nondeterministic, mysql.go:163-166).
    """
    cols = ", ".join(quote_ident(db_type, c) for c in df.columns)
    head = f"INSERT INTO {quote_ident(db_type, table)} ({cols}) VALUES\n"
    tuples = df.select(
        row_tuple_column(df).alias("t"),
        (F.col(f"`{order_by}`") if order_by else F.monotonically_increasing_id()).alias("_ord"),
    )

    # Global contiguous row index WITHOUT a single-partition window (a
    # Window.orderBy with no partitionBy funnels every tuple through one
    # task — spills/OOMs on large tables). Instead, the distributed
    # zipWithIndex shape, all in DataFrame ops:
    #   1. range-partition on _ord (distributed sort into ordered ranges;
    #      RangePartitioner's sampling is deterministically seeded, so the
    #      count job and the final job see identical boundaries),
    #   2. per-partition counts -> cumulative offsets (a metadata-sized
    #      collect: one row per partition, like AQE stats),
    #   3. index = partition offset + intra-partition row_number, where
    #      the window now parallelises across partitions.
    n_part = max(1, tuples.rdd.getNumPartitions())
    if n_part == 1:
        # single-split input (the tiny-table case): a global order is a
        # partition-local sort, so skip the range sampler AND the
        # per-partition count collect — two whole Spark jobs of fixed
        # overhead PER TABLE, which dominate a many-small-tables catalog
        # export (tools/bench_catalog.py: ~1 s/table before this path).
        # The empty-window Exchange SinglePartition is a no-op here:
        # the input already IS one partition.
        w = Window.partitionBy(F.lit(0)).orderBy("_ord")
        idx = F.row_number().over(w) - F.lit(1)
        batched = tuples.select(
            "t",
            idx.alias("_idx"),
            F.floor(idx / F.lit(batch_size)).alias("_batch"),
        )
    else:
        ranged = tuples.repartitionByRange(n_part, F.col("_ord")).withColumn(
            "_pid", F.spark_partition_id()
        )
        counts = (
            ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
        )
        offsets, acc = [], 0
        for r in sorted(counts, key=lambda r: r["_pid"]):
            offsets.append((r["_pid"], acc))
            acc += r["_n"]
        if not offsets:
            offsets = [(0, 0)]
        off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
        w = Window.partitionBy("_pid").orderBy("_ord")
        idx = F.col("_off") + F.row_number().over(w) - F.lit(1)
        batched = ranged.join(F.broadcast(off_df), "_pid").select(
            "t",
            idx.alias("_idx"),
            F.floor(idx / F.lit(batch_size)).alias("_batch"),
        )
    # collect_list order is not guaranteed after the groupBy shuffle;
    # sort each batch's <=batch_size tuples by their global index
    batch_body = F.concat_ws(
        ",\n",
        F.transform(
            F.array_sort(F.collect_list(F.struct("_idx", "t"))),
            lambda s: s["t"],
        ),
    )
    return (
        batched.groupBy("_batch")
        .agg(batch_body.alias("body"))
        .orderBy("_batch")
        .select(F.concat(F.lit(head), F.col("body"), F.lit(";")).alias("stmt"))
    )


# ---------------------------------------------------------------------------
# Dialect text (exporter.go:91-166, 259-271)
# ---------------------------------------------------------------------------

_DIALECT_HEADERS = {
    "mysql": (
        "SET NAMES utf8mb4;\n"
        "SET FOREIGN_KEY_CHECKS = 0;\n"
        "SET SQL_MODE = 'NO_AUTO_VALUE_ON_ZERO';\n"
        "SET AUTOCOMMIT = 0;\n"
        "START TRANSACTION;\n\n"
    ),
    "postgres": (
        "SET client_encoding = 'UTF8';\n"
        "SET standard_conforming_strings = on;\n"
        "SET check_function_bodies = false;\n"
        "SET client_min_messages = warning;\n\n"
    ),
    "sqlite": "PRAGMA foreign_keys = OFF;\n\n",
}

_DIALECT_FOOTERS = {
    "mysql": "\nCOMMIT;\nSET FOREIGN_KEY_CHECKS = 1;\n",
    "postgres": "\n-- End of dump\n",
    "sqlite": "\nPRAGMA foreign_keys = ON;\n",
}


def header_text(db_type: str, generated_at: str | None = None) -> str:
    ts = generated_at or time.strftime("%Y-%m-%dT%H:%M:%S%z")
    return (
        f"-- Database Dump\n-- Generated by dbmask-spark\n-- Date: {ts}\n"
        f"-- Database Type: {db_type}\n\n" + _DIALECT_HEADERS.get(db_type, "")
    )


def footer_text(db_type: str) -> str:
    return _DIALECT_FOOTERS.get(db_type, "")


def drop_table_statement(db_type: str, table: str) -> str:
    quoted = f"`{table}`" if db_type == "mysql" else f'"{table}"'
    if db_type == "postgres":
        return f"DROP TABLE IF EXISTS {quoted} CASCADE;"
    return f"DROP TABLE IF EXISTS {quoted};"


# ---------------------------------------------------------------------------
# Full export orchestration
# ---------------------------------------------------------------------------


@dataclass
class ExportStats:
    """exporter.go:23-28 counters."""

    tables_exported: int = 0
    tables_truncated: int = 0
    rows_exported: int = 0
    per_table_rows: dict[str, int] = field(default_factory=dict)


def write_dump(
    out: IO[str],
    db_type: str,
    tables: Iterator[tuple[str, str, DataFrame | None, str | None]],
) -> ExportStats:
    """Stream an ordered dump: header -> per-table sections -> footer.

    ``tables`` yields (name, create_ddl, dataframe_or_None, order_by); a
    None dataframe means truncate (DDL only, exporter.go:191-197). The
    iterator must already be in FK-topo order (schema.go:62-166).
    """
    stats = ExportStats()
    out.write(header_text(db_type))
    for name, ddl, df, order_by in tables:
        out.write(f"\n--\n-- Table: {name}\n--\n\n")
        out.write(drop_table_statement(db_type, name) + "\n")
        out.write(ddl.rstrip("\n") + "\n\n")
        if df is None:
            stats.tables_truncated += 1
            continue
        stmts = insert_statements(df, name, order_by=order_by, db_type=db_type)
        n = 0
        for row in stmts.toLocalIterator():  # streamed; never collected whole
            out.write(row["stmt"] + "\n")
            # each tuple sits on its own line starting "(" (embedded
            # newlines in data are escaped to literal \n) — counting them
            # avoids a df.count() that would RE-RUN the whole plan
            n += row["stmt"].count("\n(")
        stats.rows_exported += n
        stats.per_table_rows[name] = n
        stats.tables_exported += 1
    out.write(footer_text(db_type))
    return stats


def write_dump_parallel(
    out: IO[str],
    db_type: str,
    tables: list[tuple[str, str, DataFrame | None, str | None]],
    max_workers: int = 8,
) -> ExportStats:
    """Parallel variant of ``write_dump``: per-table INSERT formatting
    runs as CONCURRENT Spark jobs (the reference is strictly sequential,
    exporter.go:72-80 — tables are independent, so only the sink COMMIT
    order needs the FK topo sort, SURVEY §3.1).

    Each table's statements land in a spool file via ``df.write.text``
    (distributed write, no driver materialisation); the driver then
    streams the spools into the dump in topo order. Spark's scheduler
    interleaves the jobs across the cluster — small tables no longer
    serialise behind large ones.

    ``max_workers`` saturates around 8 on a many-small-tables catalog
    (tools/bench_catalog.py, 40 x 200-row tables, local[32]: 18.1 s at
    4 workers, 14.8 s at 8, 15.9 s at 16 — the limit is driver-side
    job submission, not executor slots).
    """
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    stats = ExportStats()
    spool_root = tempfile.mkdtemp(prefix="dbmask_dump_")

    def format_table(idx: int, name: str, df: DataFrame, order_by: str | None):
        path = f"{spool_root}/{idx:04d}_{name}"
        stmts = insert_statements(df, name, order_by=order_by, db_type=db_type)
        stmts.coalesce(1).write.mode("overwrite").text(path)
        return path

    jobs: dict[str, object] = {}
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for i, (name, _ddl, df, order_by) in enumerate(tables):
            if df is not None:
                jobs[name] = pool.submit(format_table, i, name, df, order_by)

        out.write(header_text(db_type))
        for name, ddl, df, _order_by in tables:
            out.write(f"\n--\n-- Table: {name}\n--\n\n")
            out.write(drop_table_statement(db_type, name) + "\n")
            out.write(ddl.rstrip("\n") + "\n\n")
            if df is None:
                stats.tables_truncated += 1
                continue
            spool = jobs[name].result()  # wait only for THIS table
            rows = 0
            for part in sorted(Path(spool).glob("part-*")):
                with open(part) as f:
                    for line in f:
                        out.write(line)
                        if line.startswith("("):  # one tuple per line
                            rows += 1
            stats.rows_exported += rows
            stats.per_table_rows[name] = rows
            stats.tables_exported += 1
        out.write(footer_text(db_type))
    shutil.rmtree(spool_root, ignore_errors=True)
    return stats


def write_parquet(
    df: DataFrame,
    path: str | Path,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Native sink alternative: columnar, partition-parallel, splittable —
    what you actually want at 100 TB instead of a text dump.

    ``partition_by`` hive-partitions the output directory so downstream
    readers get partition *pruning* (a date filter touches only matching
    directories — verified in ``tests/test_plans.py``).
    ``max_records_per_file`` bounds file size against partition skew."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(str(path))


def write_jsonl(
    df: DataFrame,
    path: str | Path,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """JSON-Lines sink — the lingua franca of LLM training-data
    pipelines (one JSON object per line, shard-per-file, streamable by
    any loader). Distributed and splittable like the parquet sink
    (uncompressed or with a splittable codec); timestamps serialise as
    ISO-8601 strings, arrays/maps as native JSON. ``max_records_per_
    file`` caps SHARD size — training loaders shuffle at shard
    granularity, so bounded shards are a data-quality property, not
    just an IO one. ``compression`` e.g. ``gzip``/``zstd`` (gzip
    shards are not splittable; at 100 TB prefer zstd or none)."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    w.json(str(path))


def write_sorted_parquet(
    df: DataFrame,
    path: str | Path,
    sort_by: list[str],
    num_partitions: int | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Globally-ordered parquet: range-partition on the sort key, sort
    within each partition. File k's keys all precede file k+1's, and each
    file is internally sorted — a reader can binary-search the dataset
    (or a downstream merge-join can consume it without re-sorting), the
    layout a key-ordered 100 TB export wants.

    This is exactly what a naive ``orderBy().write`` produces, but
    spelled explicitly: ``repartitionByRange`` (sampled range exchange,
    parallelism preserved; skewed keys get split by sampling) +
    ``sortWithinPartitions`` (local sort, no single-point merge). The
    plan must show RangePartitioning — never a global single-partition
    Sort (gated in tests/test_plans.py). Parquet min/max column stats on
    the sort key then give readers file-level pruning for key ranges.
    """
    cols = [F.col(c) for c in sort_by]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    writer = ranged.sortWithinPartitions(*cols).write.mode(mode)
    if max_records_per_file:
        # the cap applies inside each range partition; splitting a
        # sorted partition keeps global key order across the resulting
        # files, so the layout guarantee above survives the cap
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(str(path))


_Z_BITS = 16  # per-dimension resolution of the interleaved key


def zvalue_column(
    df: DataFrame, col_a: str, col_b: str
) -> "tuple[DataFrame, Column]":
    """(df_with_bucket_codes, zvalue Column) — Morton/Z-value of two
    numeric columns, all JVM-side: each column
    is rank-bucketed to ``_Z_BITS`` bits via its percent_rank over a
    sampled-window-free approximation — here an ntile-equivalent built
    from min/max scaling (monotone per column, which is all Z-ordering
    needs) — then the two 16-bit codes are bit-interleaved into one
    32-bit key. Rows close in BOTH dimensions get close z-values, so a
    z-sorted layout yields tight per-file bounding boxes on BOTH
    columns and parquet min/max stats prune files for 2-D predicates —
    the multi-dimensional member of the layout family
    (partitioned / sorted / compacted / z-ordered).

    Min/max scaling is statistics the optimizer or a prior pass already
    has; percentile bucketing (equi-depth) drops in for skewed columns
    by swapping the scale expression — the interleave is unchanged.
    """
    stats = df.agg(
        F.min(col_a).cast("double").alias("a_min"),
        F.max(col_a).cast("double").alias("a_max"),
        F.min(col_b).cast("double").alias("b_min"),
        F.max(col_b).cast("double").alias("b_max"),
    )
    top = (1 << _Z_BITS) - 1

    def code(col: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        frac = F.when(span > 0, (F.col(col).cast("double") - F.col(lo)) / span).otherwise(
            F.lit(0.0)
        )
        return F.least(
            F.lit(top), F.floor(frac * (top + 1)).cast("int")
        ).alias(f"z_{col}")

    # bit interleave: a takes even bit positions, b odd (bitwiseAND /
    # bitwiseOR — Python's & | on Columns are BOOLEAN operators).
    # The fold runs in LONG: with _Z_BITS=16, b's top bit lands at
    # position 31, which in a 32-bit int is the sign bit — the upper
    # half of b's range would sort before everything else, splitting
    # the curve into two swapped halves.
    def interleave(a: Column, b: Column) -> Column:
        a = a.cast("long")
        b = b.cast("long")
        out = F.lit(0).cast("long")
        for i in range(_Z_BITS):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
                )
            )
        return out

    with_codes = df.crossJoin(F.broadcast(stats)).select(
        *df.columns,
        code(col_a, "a_min", "a_max"),
        code(col_b, "b_min", "b_max"),
    )
    return with_codes, interleave(
        F.col(f"z_{col_a}"), F.col(f"z_{col_b}")
    ).alias("zvalue")


def write_zorder_parquet(
    df: DataFrame,
    path: str | Path,
    col_a: str,
    col_b: str,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: compute the Morton key of (col_a,
    col_b), range-partition and locally sort on it, write without the
    helper columns. Each output file then covers a small rectangle in
    (col_a, col_b) space — parquet min/max stats on BOTH columns prune
    files for 2-D predicates, which a 1-D sort can only do for its
    leading column. Same distributed shape as write_sorted_parquet
    (RangePartitioning + local sort — never a global single-partition
    Sort); the z-key costs one broadcast of a 1-row min/max aggregate
    and a map-side bit-interleave projection."""
    coded, z = zvalue_column(df, col_a, col_b)
    keyed = coded.select(*df.columns, z)
    if num_partitions:
        ranged = keyed.repartitionByRange(num_partitions, F.col("zvalue"))
    else:
        ranged = keyed.repartitionByRange(F.col("zvalue"))
    (
        ranged.sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode(mode)
        .parquet(str(path))
    )


def _hive_partition_columns(p: Path) -> list[str]:
    """Partition columns from the ``key=value`` directory layout (one key
    per nesting level, hive convention)."""
    cols: list[str] = []
    cur = p
    while True:
        subdirs = [d for d in cur.iterdir() if d.is_dir() and "=" in d.name]
        if not subdirs:
            return cols
        cols.append(subdirs[0].name.split("=", 1)[0])
        cur = subdirs[0]


def compact_parquet(
    spark,
    path: str | Path,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet dataset into ~target-sized files; returns the new
    file count.

    Small-file buildup is the classic failure mode of incremental writes
    at scale (every micro-batch/table-export leaves part files; 100 TB of
    1 MB files = 10^8 scan tasks). Sizing from the dataset's actual bytes
    on disk — not a row-count guess — keeps output files near the parquet
    sweet spot.

    A hive-partitioned dataset is re-written WITH the same partitionBy —
    flattening it would silently fold the partition columns into the data
    files and lose partition pruning for every downstream reader. The
    promotion is crash-safe: the new data is written to ``.compact.tmp``,
    the old dataset is renamed aside (never deleted before the new one is
    in place), then the tmp dir takes its name; a crash at any point
    leaves at least one complete copy on disk."""
    import shutil

    p = Path(path)
    total = sum(f.stat().st_size for f in p.rglob("*.parquet"))
    n = max(1, -(-total // target_file_bytes))  # ceil
    part_cols = _hive_partition_columns(p)
    df = spark.read.parquet(str(p))
    tmp = str(p) + ".compact.tmp"
    if part_cols:
        # one shuffle on the partition keys: each task holds whole
        # partitions, so each partition dir gets ~1 compacted file
        (
            df.repartition(int(n), *part_cols)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp)
        )
    else:
        # shrinking the file count needs no shuffle at all
        df.coalesce(int(n)).write.mode("overwrite").parquet(tmp)

    old = Path(str(p) + ".compact.old")
    if old.exists():
        shutil.rmtree(old)
    p.rename(old)  # keep the original until the new copy is promoted
    Path(tmp).rename(p)
    shutil.rmtree(old)
    return len(list(p.rglob("*.parquet")))


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
    path: "str | Path | None" = None,
) -> None:
    """Hash-bucketed (and bucket-sorted) managed parquet table — the
    layout-family member that eliminates the JOIN shuffle, not just the
    scan cost.

    ``bucketBy(n, col)`` hash-partitions rows into ``n`` bucket files at
    WRITE time and records the bucket spec in the catalog. A later join
    (or aggregation) keyed on the bucket column reads each bucket as a
    pre-hash-partitioned split, so EnsureRequirements inserts NO
    Exchange on that side: two tables bucketed on their join keys with
    the same bucket count sort-merge-join with ZERO shuffle of either
    side (gated in tests/test_plans.py). At 100 TB this converts every
    repeated fact-fact join on a stable key (orders x lineitem on
    orderkey, events x users on user_id) from the single most expensive
    network operation in the pipeline into a local merge — the write
    pays the shuffle once, every downstream join rides it for free.

    ``sortBy`` additionally orders rows inside each bucket file so a
    sorted-bucket reader can skip or cheapen the merge sort. Bucket
    count is a layout contract: pick it once per subject area (both
    sides must match for co-location) and size it so one bucket of the
    LARGEST table fits an executor core's working set at target scale.

    ``path`` pins the table data to an explicit (external-table)
    location instead of ``spark.sql.warehouse.dir`` — the warehouse
    default is ``cwd/spark-warehouse``, which an embedding process may
    not be able to write.

    The reference's single-node exporter has no equivalent (it streams
    one table at a time, exporter.go:65-88); this is Spark-native
    physical design."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    if mode == "overwrite":
        # idempotent across sessions: the in-memory catalog forgets
        # tables on restart but their data directory survives, and
        # saveAsTable refuses to reuse a managed location
        # (LOCATION_ALREADY_EXISTS); for an explicit path, a stale dir
        # would shadow the overwrite. ONLY for overwrite — any other
        # mode (append) must never pre-delete existing data
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        if path is not None:
            stale = Path(path)
        else:
            warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
            stale = Path(warehouse.path) / table.lower()
        if stale.exists():
            shutil.rmtree(stale)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
    )
    if path is not None:
        writer = writer.option("path", str(path))
    writer.saveAsTable(table)
