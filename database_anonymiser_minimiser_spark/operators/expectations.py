"""Data-quality expectations: declarative constraints verified in ONE
aggregation pass (Deequ-style, plain DataFrame ops).

A 100 TB ingest needs its quality gates to cost one scan, not one scan
per constraint: every check here compiles to an aggregate expression
over the same single groupBy().agg() — completeness, uniqueness,
ranges, set membership all ride ONE scan and ONE partial-aggregated
reduction (plan-asserted in tests; an exact-uniqueness check adds the
distinct pre-reduction stage Catalyst plans for count_distinct — one
extra Exchange, still one scan). Referential containment
(`fk_contained`) is the exception by nature — it is a left-anti join,
priced separately.

Output is a tidy (constraint, passed, observed) relation so a pipeline
can `.filter(~passed)` and fail the run, write the audit trail next to
the data, or feed a dashboard.

Extension surface — the reference validates config shape only
(config.go), never data; this is the operational gate its users ask for
before trusting an anonymised export.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named constraint: `observed` is an aggregate Column, `passed`
    a predicate over the observed value."""

    name: str
    observed: Column
    passed: "callable"


def complete(col: str) -> Expectation:
    """No NULLs in `col`. Vacuously true on an empty relation (avg over
    zero rows is NULL — coalesced, or the audit would crash formatting
    a None observed value)."""
    frac = F.coalesce(
        F.avg(F.when(F.col(col).isNull(), 1.0).otherwise(0.0)), F.lit(0.0)
    )
    return Expectation(f"complete({col})", frac, lambda o: o == 0.0)


def unique(col: str) -> Expectation:
    """`col` is unique (count == distinct count; NULLs count as rows but
    not as distinct values, so a single NULL still fails)."""
    delta = F.count(F.lit(1)) - F.count_distinct(F.col(col))
    return Expectation(f"unique({col})", delta.cast("double"), lambda o: o == 0.0)


def in_range(col: str, lo: float, hi: float) -> Expectation:
    """All non-NULL values of `col` within [lo, hi]; vacuously true on
    an empty relation (sum over zero rows is NULL — coalesced)."""
    bad = F.coalesce(
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1
            ).otherwise(0)
        ),
        F.lit(0),
    )
    return Expectation(
        f"in_range({col},{lo},{hi})", bad.cast("double"), lambda o: o == 0.0
    )


def member_of(col: str, allowed: "list[str]") -> Expectation:
    """All non-NULL values of `col` drawn from `allowed`; vacuously true
    on an empty relation (sum over zero rows is NULL — coalesced)."""
    bad = F.coalesce(
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(allowed), 1
            ).otherwise(0)
        ),
        F.lit(0),
    )
    return Expectation(
        f"member_of({col})", bad.cast("double"), lambda o: o == 0.0
    )


def min_rows(n: int) -> Expectation:
    """At least `n` rows (an empty export is the classic silent failure)."""
    return Expectation(
        f"min_rows({n})",
        F.count(F.lit(1)).cast("double"),
        lambda o: o >= float(n),
    )


def check(df: DataFrame, expectations: "list[Expectation]") -> DataFrame:
    """(constraint string, passed boolean, observed double) — ALL
    expectations verified in ONE aggregation over `df` (single Exchange;
    the observed aggregates are computed map-side-partial like any
    other agg). `passed` is evaluated JVM-side on the 1-row result."""
    if not expectations:
        raise ValueError("no expectations given")
    names = [e.name for e in expectations]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        # the passed-predicate dispatch below keys on the constraint
        # name; a duplicate would silently apply the LAST expectation's
        # predicate to both rows
        raise ValueError(f"duplicate expectation names: {dupes}")
    agg_row = df.agg(
        *[e.observed.alias(f"o{i}") for i, e in enumerate(expectations)]
    )
    # tidy rows built with struct/lit Columns, never interpolated SQL
    # text — a quote or backtick in an expectation name is data here,
    # not syntax
    tidy = agg_row.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(e.name).alias("constraint"),
                        F.col(f"o{i}").cast("double").alias("observed"),
                    )
                    for i, e in enumerate(expectations)
                ]
            )
        )
    )
    passed = F.lit(False)
    for e in expectations:
        passed = F.when(
            F.col("constraint") == e.name, e.passed(F.col("observed"))
        ).otherwise(passed)
    return tidy.select("constraint", passed.alias("passed"), "observed")


def fk_contained(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> DataFrame:
    """(constraint, passed, observed): every non-NULL child key exists in
    the parent — one left-anti join (key-partitioned; the parent side
    broadcasts when dimension-sized). Kept separate from check():
    referential containment inherently costs a join, not an aggregate."""
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            child_col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("observed"))
    )
    return orphans.select(
        F.lit(f"fk_contained({child_col})").alias("constraint"),
        (F.col("observed") == 0.0).alias("passed"),
        "observed",
    )


class QualityConfigError(ValueError):
    """A malformed config ``quality`` block — raised at LOAD time so a
    typo'd contract fails before any Spark work, like every other
    config mistake."""


_CHECKS = ("complete", "unique", "in_range", "member_of", "min_rows")


def parse_quality_block(raw, build: bool = True):
    """Validate a config ``quality`` block; with ``build=True`` compile
    it to per-table expectation lists for the audit verb::

        quality:
          orders:
            - {check: complete, column: o_orderkey}
            - {check: unique, column: o_orderkey}
            - {check: in_range, column: o_totalprice, lo: 0, hi: 600000}
            - {check: member_of, column: o_orderstatus, allowed: [O, F, P]}
            - {check: min_rows, n: 100}

    The reference validates config SHAPE only (config.go); this is the
    data-contract counterpart its users run before trusting an export —
    all of a table's contracts verify in ONE aggregation pass
    (:func:`check`).

    ``build=False`` performs the FULL validation without constructing
    any pyspark Column — config load runs before a SparkSession exists,
    and the expectation constructors need an active context. The audit
    verb re-parses with ``build=True`` once the session is up."""
    if not isinstance(raw, dict) or not raw:
        raise QualityConfigError(
            "quality must be a non-empty mapping of table -> contract list"
        )
    out: dict = {}
    for table, entries in raw.items():
        if not isinstance(entries, list) or not entries:
            raise QualityConfigError(
                f"quality.{table} must be a non-empty list of contracts"
            )
        names: list = []
        builders: list = []
        for i, e in enumerate(entries):
            where = f"quality.{table}[{i}]"
            if not isinstance(e, dict):
                raise QualityConfigError(f"{where} must be a mapping")
            kind = str(e.get("check", "") or "")
            if kind not in _CHECKS:
                raise QualityConfigError(
                    f"{where}: check must be one of {', '.join(_CHECKS)} "
                    f"(got {kind!r})"
                )
            col = e.get("column")
            if kind != "min_rows" and not col:
                raise QualityConfigError(f"{where} ({kind}) requires 'column'")
            col = str(col)
            if kind == "complete":
                names.append(f"complete({col})")
                builders.append(lambda c=col: complete(c))
            elif kind == "unique":
                names.append(f"unique({col})")
                builders.append(lambda c=col: unique(c))
            elif kind == "in_range":
                if e.get("lo") is None or e.get("hi") is None:
                    raise QualityConfigError(
                        f"{where} (in_range) requires 'lo' and 'hi'"
                    )
                lo, hi = float(e["lo"]), float(e["hi"])
                names.append(f"in_range({col},{lo},{hi})")
                builders.append(lambda c=col, a=lo, b=hi: in_range(c, a, b))
            elif kind == "member_of":
                allowed = e.get("allowed")
                if not isinstance(allowed, list) or not allowed:
                    raise QualityConfigError(
                        f"{where} (member_of) requires a non-empty "
                        "'allowed' list"
                    )
                vals = [str(a) for a in allowed]
                names.append(f"member_of({col})")
                builders.append(lambda c=col, v=vals: member_of(c, v))
            elif kind == "min_rows":
                n = e.get("n")
                if not isinstance(n, int) or n < 1:
                    raise QualityConfigError(
                        f"{where} (min_rows) requires integer n >= 1"
                    )
                names.append(f"min_rows({n})")
                builders.append(lambda k=n: min_rows(k))
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            raise QualityConfigError(
                f"quality.{table}: duplicate contracts {dupes}"
            )
        out[table] = [b() for b in builders] if build else names
    return out
