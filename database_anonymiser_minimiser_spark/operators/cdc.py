"""Change-data-capture application: merge a change feed into a snapshot.

`snapshot_diff_cdc` (queries.py) derives the change feed; this module
applies one — the MERGE/upsert half of the incremental-export story the
reference lacks (it re-dumps everything each run, exporter.go:65-88).
Lakehouse engines expose this as MERGE INTO; the Spark-primitive
formulation is one anti join plus a union, which Catalyst schedules as a
single shuffle on the key (zero with bucketed/co-partitioned inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "change_type",
) -> DataFrame:
    """Merged snapshot: ``base`` with ``changes`` applied.

    ``changes`` carries the key, ``op_col`` in {'insert','update',
    'delete'}, and the full payload columns for insert/update rows
    (delete rows need only the key). Semantics match MERGE INTO:

    - delete: row leaves the snapshot,
    - update: payload replaces the base row (full-row replacement),
    - insert: payload appears (an insert whose key exists behaves as an
      update — last-writer-wins on the feed, matching upsert semantics).

    Plan shape: one left-anti join on the key (drops every touched base
    row) + union of the insert/update payloads — no window, no full
    outer join, no driver involvement. At 100 TB the anti join shuffles
    base once on the key; with the snapshot bucketed by key it is
    co-located and shuffle-free.
    """
    upserts = changes.filter(F.col(op_col) != "delete").drop(op_col)
    survivors = base.join(changes.select(key).distinct(), key, "left_anti")
    return survivors.unionByName(upserts)
