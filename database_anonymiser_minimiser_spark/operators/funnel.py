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


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """(step int, users long) — how many users reached each step."""
    per_user = funnel_times(df, user_col, ts_col, type_col, steps)
    counts = per_user.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"u{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    structs = ", ".join(
        f"named_struct('step', {i}, 'users', u{i})"
        for i in range(1, len(steps) + 1)
    )
    return counts.selectExpr(f"inline(array({structs}))")


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
