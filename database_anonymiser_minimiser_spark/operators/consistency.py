"""Consistency mapping for realistic (non-deterministic) faker mode.

The reference memoises generated values in a mutex-guarded in-process map
keyed ``"col:origValue"`` so the same original always gets the same fake
across every table (``internal/anonymiser/anonymiser.go:19-23, 74-91``).
Unbounded driver state is a non-starter at 100 TB; the Spark-native
equivalent (SURVEY §2.3, §7.3):

1. union the distinct originals of every configured column,
2. generate one fake per distinct original (any generator — including
   realistic Python/Faker pandas_udfs — because it runs once per
   DISTINCT value, not per row),
3. broadcast-join the mapping back onto each table (or shuffle-join when
   the distinct count exceeds the broadcast threshold — the
   ``broadcast`` flag drops the hint and lets AQE decide).

This is side-effect-free (no mutex — M4 is moot), incremental (persist
the mapping table to extend it across runs), and the big side never
shuffles under the broadcast hint.

Note the reference only memoises *string* originals; non-strings get a
fresh value per row (anonymiser.go:58-67). We key on the string-cast
value for every type — a documented divergence that strictly strengthens
consistency.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_mapping(
    sources: list[tuple[DataFrame, str]],
    generator: "Column | None" = None,
) -> DataFrame:
    """(original string, fake) over the union of distinct values of every
    (df, column) source. ``generator`` is any Column expression over
    ``original`` — deterministic faker by default, or a realistic
    pandas_udf column."""
    from ..functions.faker_deterministic import FAKER_FUNCTIONS

    cols = [
        df.select(F.col(f"`{c}`").cast("string").alias("original")).where(
            F.col(f"`{c}`").isNotNull()
        )
        for df, c in sources
    ]
    distinct = reduce(DataFrame.union, cols).distinct()
    gen = (
        generator
        if generator is not None
        else F.expr(FAKER_FUNCTIONS["email"].sql("spark", "original"))
    )
    return distinct.select("original", gen.alias("fake"))


def apply_mapping(
    df: DataFrame, column: str, mapping: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Replace ``column`` via a left join against the mapping; unmatched
    originals (e.g. NULL) stay NULL like the reference's null handling.

    ``broadcast=True`` hints the mapping side; with huge distinct counts
    pass False and let AQE pick sort-merge (and split skewed keys)."""
    m = mapping.withColumnsRenamed({"original": "__orig", "fake": "__fake"})
    if broadcast:
        m = F.broadcast(m)
    joined = df.join(m, df[f"`{column}`"].cast("string") == m["__orig"], "left")
    replaced = [
        (F.col("__fake") if c == column else df[f"`{c}`"]).alias(c)
        for c in df.columns
    ]
    return joined.select(*replaced)
