"""Mergeable t-digest quantile sketch (user-space distributive agg).

A from-scratch merging t-digest (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", arXiv:1902.04023 — public
algorithm): values are summarised into <= ~2*delta weighted centroids
whose sizes are bounded by the k1 scale function, so accuracy
concentrates at the tails (rank error O(q(1-q)/delta)). Digests are
order-insensitively mergeable — concatenate centroid lists, sort by
mean, re-compress — which is exactly the shape a 100 TB aggregation
needs: per-Arrow-batch partial digests built map-side (no shuffle of
raw rows), then a digest-only shuffle whose volume is
#batches x #groups x O(delta) doubles, independent of row count.

Why user-space when Spark has percentile_approx: percentile_approx IS
a t-digest internally, but it is a black box — this module is the
template for ANY custom distributive sketch the built-ins lack (the
same two-level mapInPandas -> merge shape as the Misra-Gries summary
in operators/sketch.py), and its accuracy is band-gated against the
exact percentile in the same plan (`percentiles_tdigest_band_orders`),
the pattern this repo uses to make approximate operators
driver-hashable.

Scale notes (100 TB):
- stage 1 is mapInPandas: transient memory is one Arrow batch
  (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k rows)
  plus O(delta) per group seen in the batch — partition-size
  independent.
- the merge is TWO-level (groupBy(group, shard) pre-merge, then
  groupBy(group)): with millions of map-side digests per group, a
  single reducer per group would re-serialise them all in one task;
  the shard level caps any task's input at ~#digests/shards and the
  final level sees only shards x O(delta) centroids per group.
- compression is a single stable-sorted linear pass (numpy sort +
  Python fold over <= batch-distinct values) — no quadratic step.

The reference engine has no sketch machinery; this is part of the
training-data extension surface (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "compress",
    "merge_digests",
    "quantile",
    "tdigest_quantiles",
]


def _k1(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    """k1 scale function: k(q) = delta/(2*pi) * asin(2q - 1). Its unit
    steps bound centroid mass so tail centroids stay tiny (asin slope
    diverges at q=0,1) — the property that makes extreme quantiles
    accurate."""
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.asarray(q, dtype=np.float64) - 1.0)


def compress(
    means: np.ndarray, weights: np.ndarray, delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge-compress weighted centroids to the k1 size bound.

    Input arrays in ANY order; output sorted by mean with
    len <= ~2*delta. Deterministic for a given input MULTISET: the sort
    is stable on (mean, weight) pairs and the fold is left-to-right, so
    any permutation of the same centroids compresses identically —
    which is what makes the distributed merge order-insensitive.
    """
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if means.size == 0:
        return means, weights
    # stable two-key sort: mean asc, weight asc for equal means
    order = np.lexsort((weights, means))
    m, w = means[order], weights[order]
    total = float(w.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(m[0]), float(w[0])
    cum = 0.0  # total weight strictly before the current centroid
    for i in range(1, m.size):
        proposed = cur_w + float(w[i])
        q0 = cum / total
        q2 = min((cum + proposed) / total, 1.0)
        if _k1(q2, delta) - _k1(q0, delta) <= 1.0:
            cur_m += (float(m[i]) - cur_m) * (float(w[i]) / proposed)
            cur_w = proposed
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m[i]), float(w[i])
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def merge_digests(
    parts: Sequence[tuple[np.ndarray, np.ndarray]], delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge any number of digests: concatenate and re-compress (the
    sort inside compress() makes the result independent of ``parts``
    order — property-tested in tests/test_tdigest.py)."""
    means = np.concatenate([p[0] for p in parts]) if parts else np.array([])
    weights = np.concatenate([p[1] for p in parts]) if parts else np.array([])
    return compress(means, weights, delta)


def quantile(
    means: np.ndarray,
    weights: np.ndarray,
    vmin: float,
    vmax: float,
    ps: Sequence[float],
) -> np.ndarray:
    """Quantile estimates by piecewise-linear interpolation through the
    centroid cumulative MIDPOINTS, anchored at the exact (vmin, vmax)
    observed extremes — so q=0 / q=1 are exact and interior estimates
    are monotone in p (np.interp over an increasing rank axis)."""
    w = np.asarray(weights, dtype=np.float64)
    m = np.asarray(means, dtype=np.float64)
    total = float(w.sum())
    mid = np.cumsum(w) - w / 2.0
    xs = np.concatenate(([0.0], mid, [total]))
    fs = np.concatenate(([vmin], m, [vmax]))
    t = np.asarray(ps, dtype=np.float64) * total
    return np.interp(t, xs, fs)


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    ps: Sequence[float],
    delta: float = 100.0,
    shards: int = 8,
) -> DataFrame:
    """Distributed per-group quantile estimates via two-level t-digest.

    Plan shape (the 100 TB template for custom distributive sketches):

    1. mapInPandas over the raw scan: each Arrow batch is grouped
       in-memory and folded into one digest row per (batch, group) —
       the raw rows are NEVER shuffled, only O(delta)-sized digests.
    2. groupBy(group, shard).applyInPandas: pre-merge so no single
       task ever re-reads every map-side digest of a hot group.
    3. groupBy(group).applyInPandas: final merge + interpolation,
       emitting one row per (group, p).

    Output columns: ``*group_cols, p double, est double``.
    """
    gcols = list(group_cols)
    # NaN must be stripped alongside NULL: isNotNull() passes NaN, and a
    # single NaN poisons vmin/vmax and every centroid mean for its group.
    # Matches the streaming twin (_update_tdigest strips NaN explicitly).
    src = df.select(*gcols, F.col(value_col).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull() & ~F.isnan("_v")
    )
    gfields = [src.schema[c] for c in gcols]
    digest_schema = StructType(
        gfields
        + [
            StructField("means", ArrayType(DoubleType()), False),
            StructField("weights", ArrayType(DoubleType()), False),
            StructField("vmin", DoubleType(), False),
            StructField("vmax", DoubleType(), False),
            StructField("n", LongType(), False),
        ]
    )

    def build(batches: Iterator) -> Iterator:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for key, grp in pdf.groupby(gcols, sort=True, dropna=False):
                vals = grp["_v"].to_numpy(dtype=np.float64)
                m, w = compress(vals, np.ones_like(vals), delta)
                row = list(key) if isinstance(key, tuple) else [key]
                out.append(
                    row
                    + [
                        m.tolist(),
                        w.tolist(),
                        float(vals.min()),
                        float(vals.max()),
                        int(vals.size),
                    ]
                )
            yield pd.DataFrame(out, columns=gcols + ["means", "weights", "vmin", "vmax", "n"])

    digests = src.mapInPandas(build, digest_schema)

    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            (np.asarray(r.means), np.asarray(r.weights)) for r in pdf.itertuples()
        ]
        m, w = merge_digests(parts, delta)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                [first[c] for c in gcols]
                + [
                    m.tolist(),
                    w.tolist(),
                    float(pdf["vmin"].min()),
                    float(pdf["vmax"].max()),
                    int(pdf["n"].sum()),
                ]
            ],
            columns=gcols + ["means", "weights", "vmin", "vmax", "n"],
        )

    # shard key varies per digest row (hash of its extremes + count) so a
    # hot group's map-side digests spread over `shards` pre-merge tasks;
    # collisions only skew task sizes, never results (merge is
    # order/partition insensitive).
    sharded = digests.withColumn(
        "_shard", F.pmod(F.xxhash64("vmin", "vmax", "n"), F.lit(shards))
    )
    pre = sharded.groupBy(*gcols, "_shard").applyInPandas(
        lambda pdf: merge_partials(pdf.drop(columns=["_shard"])), digest_schema
    )

    out_schema = StructType(
        gfields
        + [StructField("p", DoubleType(), False), StructField("est", DoubleType(), False)]
    )
    ps_list = [float(p) for p in ps]

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            (np.asarray(r.means), np.asarray(r.weights)) for r in pdf.itertuples()
        ]
        m, w = merge_digests(parts, delta)
        ests = quantile(
            m, w, float(pdf["vmin"].min()), float(pdf["vmax"].max()), ps_list
        )
        first = pdf.iloc[0]
        key = [first[c] for c in gcols]
        return pd.DataFrame(
            [key + [p, float(e)] for p, e in zip(ps_list, ests)],
            columns=gcols + ["p", "est"],
        )

    return pre.groupBy(*gcols).applyInPandas(finish, out_schema)
