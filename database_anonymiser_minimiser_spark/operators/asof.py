"""As-of (point-in-time) join: for each left row, the most recent right
row at or before the left timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas do). Two realisations:

- ``asof_join`` — the scalable **union-merge** form: tag both sides, union
  them, and run ONE window pass per key ordered by time, carrying the
  last-seen right-side values forward (``last(..., ignorenulls)``). Cost:
  a single shuffle of (left + right) on the key — the same price as a
  regular join, with no row explosion, no range-condition fallback to
  broadcast-nested-loop. This is the classic merge-join formulation of
  as-of and holds at any scale; skew on the key is addressable with the
  standard salting in operators/skew.py (the window is per-key, so hot
  keys serialize — document/partition accordingly).
- a naive pair-and-filter form (join on key, filter time range, keep max)
  is O(pairs) and exists only in tests as a correctness cross-check.

Ordering ties: a right row at exactly the left timestamp matches
(``at or before``); several right rows at the same timestamp resolve to
the one with the largest order key (deterministic, mirrored in the
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join; output = all left columns + ``payload_cols`` from
    the matched right row (NULL when no right row precedes).

    The payload travels as ONE struct so the most recent right ROW is
    carried atomically: per-column ``last(ignorenulls)`` would skip a
    right row whose payload value is genuinely NULL and stitch fields
    from different right rows together. The struct is non-NULL for every
    right row (even when all its fields are NULL), so ``last(struct,
    ignorenulls)`` always selects exactly the latest right row."""
    lcols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    null_payload = F.lit(None).cast(
        "struct<"
        + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload_cols
        )
        + ">"
    )
    l = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        null_payload.alias("__payload"),
        F.lit(None).cast("long").alias("__tb"),
    )
    tb = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col
        else F.monotonically_increasing_id()
    )
    r = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        payload_struct.alias("__payload"),
        tb.alias("__tb"),
    )
    # order: time asc, right rows BEFORE left rows at the same instant
    # ("at or before" includes equality), late tiebreak wins among rights
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r)
    carried = unioned.select(
        "*", F.last("__payload", ignorenulls=True).over(w).alias("__c")
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__c.{c}").alias(c) for c in payload_cols],
    )


def duck_asof_sql(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    left_cols: list[str],
    payload_cols: list[str],
    tiebreak_col: str,
) -> str:
    """Oracle: the SAME union-merge window form as ``asof_join``, in
    DuckDB SQL — union both sides, one last_value(IGNORE NULLS) window
    per key ordered (time, side, tiebreak) with an explicit ROWS frame.

    This replaced the original pair-and-filter LEFT JOIN + QUALIFY
    oracle in r10: that form is O(left x right-per-key) PAIRS, and on a
    zipfian corpus (both key columns hot) it OOM-killed the sf1 sweep
    harness at >126 GB inside DuckDB — the exact failure mode the
    engine's union-merge form exists to avoid, reproduced in the
    oracle. The window form is linear, keeps ties deterministic
    (DuckDB's native ASOF JOIN breaks timestamp ties arbitrarily), and
    was verified row-identical to the naive form at sf0.001/sf0.01
    before the swap. Tie order: ``__tb`` NULLs sort differently in
    DuckDB (NULLS LAST) vs Spark (NULLS FIRST) for ASC, but __tb is
    NULL exactly on left rows, whose relative order within a (key, t)
    group cannot change the carried payload."""
    lsel = ", ".join(left_cols)
    null_left = ", ".join(f"NULL AS {c}" for c in left_cols)
    struct = ", ".join(f"'{c}': {c}" for c in payload_cols)
    out_payload = ", ".join(f"__c.{c} AS {c}" for c in payload_cols)
    return f"""
    WITH __u AS (
      SELECT {left_key} AS __key, {left_time} AS __t, 1 AS __is_left,
             {lsel}, NULL AS __payload, NULL AS __tb
      FROM {left_table}
      UNION ALL
      SELECT {right_key}, {right_time}, 0, {null_left},
             {{{struct}}}, {tiebreak_col}
      FROM {right_table}
    ), __w AS (
      SELECT *, last_value(__payload IGNORE NULLS) OVER (
          PARTITION BY __key
          ORDER BY __t ASC, __is_left ASC, __tb ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __c
      FROM __u
    )
    SELECT {lsel}, {out_payload} FROM __w WHERE __is_left = 1
    """


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval (range) join: left rows whose ``ts_col`` falls in
    ``[start_col, end_col)`` of a right-side interval — with NO equi key.

    Spark's only native plan for a pure range predicate is
    BroadcastNestedLoopJoin (fine for a handful of intervals, O(n*m) and
    broadcast-bound in general). This operator makes the join scalable by
    *manufacturing* an equi key: time is cut into fixed buckets; each
    interval explodes into the buckets it covers, each left row maps to
    exactly ONE bucket, and the join becomes a hash equi-join on bucket
    with a residual range filter. A left row meets an interval in at most
    one bucket, so no dedup is needed. Cost: shuffle on bucket (or
    broadcast of the exploded intervals when small) — the BNLJ cross
    product never materialises. Interval skew = long intervals → more
    bucket replicas of the right row, never of the (big) left side.
    """
    b = int(bucket_seconds)
    r = (
        right.withColumn(
            "__bucket",
            F.explode(
                F.expr(
                    f"sequence(unix_timestamp({start_col}) div {b}, "
                    f"unix_timestamp({end_col}) div {b})"
                )
            ),
        )
    )
    l = left.withColumn("__bucket", F.expr(f"unix_timestamp({ts_col}) div {b}"))
    return (
        l.join(r, "__bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )
