"""Document chunking for LLM training pipelines: split each document
into fixed-size token windows with overlap (the context-window prep step
that follows cleaning/dedup in a corpus pipeline).

Pure JVM column expressions — tokenise once, compute the chunk count
arithmetically, then ``transform(sequence(...))`` + ``posexplode`` emits
every window from the one tokens array. No Python in the data path and
no shuffle at all: chunking is a narrow per-row expansion, so at 100 TB
it rides the scan stage and parallelises with input splits. (A
row-at-a-time UDF doing the same thing would serialise every document
through Python — the classic slow path this engine avoids.)

Chunk layout: windows of ``size`` tokens starting every ``stride``
tokens (overlap = size - stride); the final window is the possibly-short
tail. n_chunks = 1 + max(0, ceil((L - size) / stride)) — every token is
covered, identical integer arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    size: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text) -> (id, chunk_id, chunk, n_tokens) token windows."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        toks.alias("toks"),
        (
            F.lit(1)
            + F.greatest(
                F.lit(0),
                F.floor((F.size(toks) - size + stride - 1) / stride).cast("int"),
            )
        ).alias("n_chunks"),
    )
    windows = F.expr(
        f"transform(sequence(0, n_chunks - 1), "
        f"i -> array_join(slice(toks, i * {stride} + 1, {size}), ' '))"
    )
    return base.select(
        id_col, F.posexplode(windows).alias("chunk_id", "chunk")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk",
        F.size(F.split(F.col("chunk"), r"\s+")).cast("long").alias("n_tokens"),
    )


def duck_chunk_sql(
    size: int = 128, stride: int = 64, table: str = "documents"
) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM {table}),
    n AS (
      SELECT doc_id, toks,
             1 + greatest(0, (len(toks) - {size} + {stride} - 1) // {stride})
               AS n_chunks
      FROM t)
    SELECT doc_id,
           CAST(r['i'] AS BIGINT) AS chunk_id,
           r['c'] AS chunk,
           CAST(len(regexp_split_to_array(r['c'], '\\s+')) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id,
             unnest([{{'i': i,
                       'c': array_to_string(
                              toks[i*{stride}+1: i*{stride}+{size}], ' ')}}
                     FOR i IN range(0, n_chunks)]) AS r
      FROM n)
    """
