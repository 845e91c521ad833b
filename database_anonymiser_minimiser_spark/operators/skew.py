"""Skew mitigation: salted aggregation and salted broadcast-backed joins.

At 100 TB a handful of hot keys (one user generating 1% of all events, a
null-heavy FK) turn a single reducer into the job's critical path. Two
standard remedies, both pure DataFrame ops:

- **two-phase salted aggregation**: append a random salt to the group
  key, partially aggregate (key, salt), then aggregate again on the key
  alone. The hot key's rows split across `salt_buckets` reducers; the
  second phase touches only `buckets` rows per key. Works for any
  decomposable aggregate (sum/count/min/max; avg via sum+count).
- **salted join**: explode the *small* side `salt_buckets` times (one row
  per salt) and salt the big side randomly, so a hot join key's rows
  spread over `buckets` partitions instead of one.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles many
cases automatically at runtime — enabled by the session builder
(session.py) — but salting remains necessary for skewed *aggregations*
and for deterministic plan shapes; both are provided here.

The salt uses a hash of a uniformly-distributing column when given
(deterministic, testable) or `rand()` otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(buckets: int, deterministic_from: str | None) -> Column:
    if deterministic_from is not None:
        return F.pmod(F.xxhash64(F.col(deterministic_from)), F.lit(buckets))
    return (F.rand() * buckets).cast("int")


# decomposable aggregates: phase-1 fn -> phase-2 merge fn
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, "Column | str"]],
    salt_buckets: int = 16,
    deterministic_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with salting.

    ``aggs`` maps output name -> (kind, column) where kind is one of
    ``sum | count | min | max`` — the decomposable aggregates whose
    two-phase split is exact. Non-decomposable aggregates (avg, stddev,
    first, collect_*) are rejected: express them via decomposable
    moments (avg = salted sum / salted count; see zscore_events_exact
    for the variance pattern)."""
    for name, (kind, _c) in aggs.items():
        if kind not in _MERGE:
            raise ValueError(
                f"aggregate {name!r}: kind {kind!r} is not decomposable; "
                f"supported: {sorted(_MERGE)} (derive avg/variance from "
                "sum+count moments)"
            )
    salted = df.withColumn("__salt", _salt_col(salt_buckets, deterministic_from))
    p1_aggs = []
    for name, (kind, c) in aggs.items():
        if kind == "count" and c is None:
            target = F.lit(1)
        else:
            target = F.col(c) if isinstance(c, str) else c
        p1_aggs.append(getattr(F, kind)(target).alias(f"__p1_{name}"))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(*p1_aggs)
    merges = [
        _MERGE[kind](F.col(f"__p1_{name}")).alias(name)
        for name, (kind, _c) in aggs.items()
    ]
    return phase1.groupBy(*group_cols).agg(*merges)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    deterministic_from: str | None = None,
) -> DataFrame:
    """Join with the small side replicated across salt buckets.

    The big side gets a salt in [0, buckets); the small side is exploded
    to carry every salt value, so (key, salt) joins hit ``buckets``
    distinct partitions per hot key. Replication cost: |small| * buckets
    rows — keep the replicated side genuinely small (it is broadcast-
    eligible anyway; salting matters when the big side's shuffle is the
    bottleneck or broadcast is impossible).

    Only join types that preserve big-side semantics are allowed: with
    right/full outer, each unmatched *small* row would surface once per
    salt replica (``salt_buckets``-fold duplication), so those are
    rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            "rows are replicated per salt under right/full outer joins; "
            f"supported: inner, left, left_semi, left_anti"
        )
    big_salted = big.withColumn("__salt", _salt_col(salt_buckets, deterministic_from))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast(big_salted.schema["__salt"].dataType))
    joined = big_salted.join(small_salted, [on, "__salt"], how)
    return joined.drop("__salt")
