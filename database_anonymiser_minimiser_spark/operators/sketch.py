"""Mergeable frequency summaries (bounded-memory heavy hitters).

The Misra-Gries summary used by the ``heavy_hitters_sketch_pairs``
query: each executor partition tracks at most ``cap`` keys; whenever
the tracked set overflows, the (cap+1)-th largest count is subtracted
from every counter and non-positive counters are dropped.

Guarantees (classic, and property-tested in tests/test_sketch.py):

- every decrement event of size d removes >= (cap+1)*d total mass, so
  the cumulative per-key undercount within a partition processing n_p
  items is <= n_p/(cap+1);
- a key ABSENT from the final summary has true in-partition count
  <= n_p/(cap+1);
- summaries are mergeable by summing per-key estimates (the merged
  undercount bounds add), so a key absent from every partition summary
  has true global count <= n_total/(cap+1) < n_total/cap — any key
  with n * cap > n_total is guaranteed present after the merge.

The reference engine has no sketch machinery (this is part of the
training-data extension surface); the distributed shape follows the
mergeable-summaries literature (Agarwal et al., "Mergeable Summaries",
PODS'12).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable, Iterator


def mg_update(cnt: Counter, items: Iterable[str], cap: int) -> Counter:
    """Fold one batch of items into a Misra-Gries summary of capacity
    ``cap``; returns the (possibly rebuilt) counter.

    Memory note: the whole batch is folded into the Counter BEFORE the
    trim, so transient memory is O(distinct keys in the batch), not
    O(cap) — the strict cap bound holds only BETWEEN batches. Under
    mapInPandas / applyInPandasWithState the batch is one Arrow batch
    (``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k
    rows), so the transient footprint is Arrow-batch-bounded and
    independent of partition size — the property the 100 TB path needs.
    A single decrement per batch also subtracts LESS total mass than
    per-item decrements would, so the classic n_p/(cap+1) undercount
    bound is preserved (it is property-tested for arbitrary batchings
    in tests/test_sketch.py)."""
    cnt.update(items)
    if len(cnt) > cap:
        vals = sorted(cnt.values(), reverse=True)
        d = vals[cap]  # the (cap+1)-th largest count
        cnt = Counter({k: v - d for k, v in cnt.items() if v - d > 0})
    return cnt


def mg_partition_summary(batches: Iterator, cap: int, col: str):
    """mapInPandas-compatible generator: consume every Arrow batch of a
    partition, maintain one bounded Misra-Gries counter, emit a single
    (key, est) summary frame ordered deterministically."""
    import pandas as pd

    cnt: Counter = Counter()
    for pdf in batches:
        cnt = mg_update(cnt, pdf[col], cap)
    items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {col: [k for k, _ in items], "est": [v for _, v in items]}
    )


def cm_sketch(df, col: str, depth: int = 4, width: int = 1024):
    """Count-Min sketch of a key column as a BOUNDED relation of at most
    ``depth * width`` cells (row, col, cnt) — the point-frequency
    companion to the Misra-Gries top-k summary: MG answers "which keys
    are heavy", CM answers "how often did THIS key occur" for any key,
    in O(depth*width) space regardless of corpus size.

    Distributed shape, all JVM built-ins: each input row expands
    map-side into its ``depth`` (row, hash_d(key) % width) cells
    (transform + explode — no Python), and ONE partial-aggregated
    shuffle reduces them; map-side combine caps the shuffle volume at
    ``partitions * depth * width`` cell rows, the mergeable-summaries
    property (cell counts add, so per-partition sketches merge by
    elementwise sum — property-tested). Estimates (cm_estimate) read
    min over the key's ``depth`` cells: >= true count always (each cell
    only over-counts via collisions); within e/width * N with
    probability 1 - (1/2)^depth by the classic bound."""
    from pyspark.sql import functions as F

    cells = df.select(F.col(col).cast("string").alias("k")).select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), d -> named_struct("
                f"'r', d, 'c', pmod(xxhash64(concat(CAST(d AS STRING), "
                f"char(1), k)), {width})))"
            )
        ).alias("cell")
    )
    return cells.groupBy(
        F.col("cell.r").alias("r"), F.col("cell.c").cast("int").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cm_estimate(sketch, keys_df, col: str, depth: int = 4, width: int = 1024):
    """(key, est) point-frequency estimates: min over the key's depth
    cells, 0-filled for never-hit cells. ``keys_df`` is the (small)
    relation of keys to probe; the sketch side is <= depth*width rows,
    so both join inputs are bounded — the corpus never reappears."""
    from pyspark.sql import functions as F

    probes = keys_df.select(F.col(col).cast("string").alias("k")).distinct().select(
        "k",
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), d -> named_struct("
                f"'r', d, 'c', pmod(xxhash64(concat(CAST(d AS STRING), "
                f"char(1), k)), {width})))"
            )
        ).alias("cell"),
    ).select("k", F.col("cell.r").alias("r"), F.col("cell.c").cast("int").alias("c"))
    return (
        probes.join(sketch, ["r", "c"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
