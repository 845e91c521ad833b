"""Ordered funnel: per-user step-completion with strictly-after semantics.

A user completes step *i* at the EARLIEST event of step-i's type that is
strictly later than their step-(i-1) completion time (t1 = earliest
step-1 event). This "sequential min" definition is the standard product
funnel and is order-of-evaluation-free: it depends only on the event
set, never on scan order, so it is safe under speculative execution and
shuffle nondeterminism.

Spark-first shape — the part that matters at 100 TB: each step is a
conditional MIN window aggregate over the SAME ``partitionBy(user)``
spec. Catalyst plans K consecutive window operators over one
partitioning as ONE Exchange + ONE Sort; each step's condition reads the
previous step's column map-side. The per-user reduction afterwards
(groupBy user) reuses that hashpartitioning — no second corpus shuffle.
Memory is O(1) per row: no per-user event list is ever collected (a
``collect_list`` fold is unbounded for hot users), and no self-join (the
equivalent SQL is K self-joins = K corpus scans + shuffles;
plan-gated in tests/test_plans.py).

Extension surface (not in the reference — its engine has no windowed
analytics at all); the funnel/cohort family extends the event-time
operators in streaming/events.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """One row per user: t1..tK completion timestamps (NULL = never
    reached). tK non-null implies t1..t(K-1) non-null by construction."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    for i, step in enumerate(steps, 1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(
            f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"t{i}"
    t_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    # every row of a user carries identical window values; max() is just
    # the per-user reduction and reuses the window's hashpartitioning
    return out.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in t_cols]
    )


def _counts_from_times(per_user: DataFrame, n_steps: int) -> DataFrame:
    """(step int, users long) from a per-user t1..tK relation — shared
    tail of the plain and windowed funnels."""
    counts = per_user.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"u{i}")
            for i in range(1, n_steps + 1)
        ]
    )
    structs = ", ".join(
        f"named_struct('step', {i}, 'users', u{i})"
        for i in range(1, n_steps + 1)
    )
    return counts.selectExpr(f"inline(array({structs}))")


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """(step int, users long) — how many users reached each step."""
    return _counts_from_times(
        funnel_times(df, user_col, ts_col, type_col, steps), len(steps)
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """(cohort_week string, week_offset int, users long) — the weekly
    retention triangle: users bucketed by the Monday-aligned week of
    their first event, counted in every later week they were active.

    ONE corpus shuffle: groupBy(user) folds each user to
    (first_week, active_week_set); the set is bounded by the CALENDAR
    (weeks spanned by the corpus), never by event volume, so collect_set
    is safe where a per-event list would not be. The exploded
    users-x-weeks relation the matrix aggregates over is orders of
    magnitude smaller than the event log. Both keys are date_trunc
    Monday-aligned, so offset = whole weeks by integer division."""
    per_user = (
        df.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).alias("wk"),
        )
        .groupBy("u")
        .agg(F.min("wk").alias("cohort"), F.collect_set("wk").alias("weeks"))
    )
    return (
        per_user.select("cohort", F.explode("weeks").alias("wk"))
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("CAST(datediff(wk, cohort) DIV 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


def funnel_times_windowed(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within_us: int,
) -> DataFrame:
    """Windowed funnel with EXACT exists-semantics: step *i* completes at
    the earliest step-i event for which SOME step-(i-1) completion lies
    strictly before it and at most ``within_us`` microseconds earlier
    (per-step conversion window, Amplitude-style — not "whole chain
    within W of the first event").

    The greedy fold (anchor on the first step-1 event) UNDERCOUNTS here:
    with W=2 and events a@0, a@2, b@3, anchoring at a@0 misses the
    conversion that a@2 enables. Exists-semantics is order-free and
    exact, and still needs no per-user event list:

    qualifying(i, e) <=> max{ts' : ts' qualifying step i-1, ts' < e.ts}
                         >= e.ts - W
    — the RUNNING MAX of qualifying step-(i-1) timestamps strictly
    before the current row. Each step is one window aggregate over the
    SAME ``partitionBy(user).orderBy(ts_us)`` with a RANGE frame
    ``(-inf, -1]`` (range, not rows: ties at equal ts must not satisfy
    the strict <). K steps = K windows over ONE Sort + ONE Exchange;
    O(1) state per row. Timestamps ride as epoch microseconds so the
    integer range frame is exact for int and timestamp inputs alike."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    dtype = dict(df.dtypes)[ts_col]
    if dtype == "timestamp_ntz":
        # unix_micros only accepts TIMESTAMP; NTZ -> LTZ is an exact,
        # monotone epoch mapping under the engine's pinned UTC session
        # timezone (session.py) — matching the DuckDB oracle's naive/UTC
        # reading of the same parquet
        ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    elif dtype.startswith("timestamp"):
        ts_us = F.unix_micros(F.col(ts_col))
    else:
        ts_us = F.col(ts_col).cast("long")
    out = df.withColumn("_ts_us", ts_us)
    w = (
        Window.partitionBy(user_col)
        .orderBy("_ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wfull = Window.partitionBy(user_col)
    prev_q: str | None = None
    for i, step in enumerate(steps, 1):
        if prev_q is None:
            qual = F.when(F.col(type_col) == step, F.col("_ts_us"))
        else:
            latest_prev = F.max(F.col(prev_q)).over(w)
            qual = F.when(
                (F.col(type_col) == step)
                & latest_prev.isNotNull()
                & (latest_prev >= F.col("_ts_us") - F.lit(within_us)),
                F.col("_ts_us"),
            )
        out = out.withColumn(f"q{i}", qual)
        prev_q = f"q{i}"
    agg_cols = [
        F.min(F.col(f"q{i}")).over(wfull).alias(f"t{i}")
        for i in range(1, len(steps) + 1)
    ]
    staged = out.select(user_col, *agg_cols)
    return staged.groupBy(user_col).agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(1, len(steps) + 1)]
    )


def funnel_counts_windowed(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within_us: int,
) -> DataFrame:
    """(step int, users long) for the windowed exists-semantics funnel."""
    return _counts_from_times(
        funnel_times_windowed(
            df, user_col, ts_col, type_col, steps, within_us
        ),
        len(steps),
    )
