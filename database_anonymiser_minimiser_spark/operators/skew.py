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


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
    deterministic_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with salting.

    ``aggs`` maps output name -> phase-1 aggregate Column; phase 2
    re-combines with the matching merge (sum->sum, count->sum, min->min,
    max->max) inferred from the expression name, so pass aggregates whose
    merge is themselves (sum/min/max) or counts (merged by sum).
    """
    salted = df.withColumn("__salt", _salt_col(salt_buckets, deterministic_from))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[c.alias(f"__p1_{name}") for name, c in aggs.items()]
    )
    merges = []
    for name, c in aggs.items():
        expr_str = str(c._jc)  # expression text reveals the aggregate kind
        p1 = F.col(f"__p1_{name}")
        if "min(" in expr_str:
            merges.append(F.min(p1).alias(name))
        elif "max(" in expr_str:
            merges.append(F.max(p1).alias(name))
        else:  # sum and count both merge by sum
            merges.append(F.sum(p1).alias(name))
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
    bottleneck or broadcast is impossible)."""
    big_salted = big.withColumn("__salt", _salt_col(salt_buckets, deterministic_from))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast(big_salted.schema["__salt"].dataType))
    joined = big_salted.join(small_salted, [on, "__salt"], how)
    return joined.drop("__salt")
