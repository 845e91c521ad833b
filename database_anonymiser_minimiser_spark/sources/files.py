"""Generic file sources: CSV / JSON-lines / parquet behind one interface.

The reference reads only live databases (driver.go:72-83); data-lake
pipelines ingest flat files. ``read_table`` dispatches on extension and
returns a plain DataFrame, so every engine operator (anonymise, minimise,
dedup, ...) composes unchanged with any format.

Format notes (all Catalyst-native):
- parquet: columnar, predicate/column pushdown, the preferred format —
  via sources/parquet.py's nanos-tolerant reader,
- csv: schema inference on request (samples the file — at 100 TB pass an
  explicit schema: inference reads data twice), header on by default,
- json (lines): schema inference likewise; prefer explicit schemas at
  scale for the same reason.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .parquet import read_parquet_table

_FORMATS = (".parquet", ".orc", ".csv", ".json", ".jsonl", ".ndjson")


def read_table(
    spark: SparkSession,
    path: str | Path,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read one table file/directory, format from the extension."""
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix == ".parquet" or (p.is_dir() and any(p.glob("*.parquet"))):
        return read_parquet_table(spark, p)
    if suffix == ".orc":
        # ORC scans share parquet's pushdown/pruning machinery (columnar,
        # predicate pushdown, vectorised reader) — same scale profile
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.orc(str(p))
    if suffix == ".csv":
        r = spark.read.option("header", "true")
        r = r.schema(schema) if schema is not None else r.option("inferSchema", "true")
        return r.csv(str(p))
    if suffix in (".json", ".jsonl", ".ndjson"):
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(str(p))
    raise ValueError(f"unsupported table format {suffix!r} (supported: {_FORMATS})")


def write_table(df: DataFrame, path: str | Path, mode: str = "overwrite") -> None:
    """Write in the format named by the extension (parquet/csv/json)."""
    p = Path(path)
    suffix = p.suffix.lower()
    w = df.write.mode(mode)
    if suffix == ".parquet":
        w.parquet(str(p))
    elif suffix == ".orc":
        w.orc(str(p))
    elif suffix == ".csv":
        w.option("header", "true").csv(str(p))
    elif suffix in (".json", ".jsonl", ".ndjson"):
        w.json(str(p))
    else:
        raise ValueError(f"unsupported table format {suffix!r}")
