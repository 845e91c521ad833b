"""PII discovery: profile columns for PII content and suggest masking rules.

The reference requires the user to hand-author every ``columns:`` rule in
the config (``internal/config/config.go:64-126``); nothing in it answers
"which of my 400 tables/columns actually hold PII?". This operator closes
that gap: a single aggregation pass per table measures, for every string
column, how often each PII detector matches, and a deterministic
suggestion step turns those measurements (plus column-NAME heuristics)
into ready-to-paste faker rules (``{{faker.email}}``, ``{{faker.phone}}``,
...) in the engine's/reference's template grammar
(``anonymiser.go:11`` — ``{{faker.<fn>}}``) over the reference's own
16-faker vocabulary (``internal/anonymiser/faker.go:11-28``), so
``parse_rule`` classifies every suggestion as a FAKER rule, never a
static literal.

Engine shape (the part that must survive 100 TB):

* Profiling is ONE ``groupBy().agg`` per table — every detector for every
  column is a ``SUM(CASE WHEN regexp_like ...)`` inside the same partial
  aggregate, so the table is scanned once, map-side combined, and the
  shuffle carries exactly one row. No Python in the data path.
* The wide 1-row aggregate is exploded JVM-side into tidy long-form rows
  (table, column, detector, hits, n_nonnull, n_rows) — integer counts,
  never floats, so the DuckDB oracle is bit-exact.
* Rule suggestion consumes ONLY the tiny profile relation (|columns| x
  |detectors| rows). Threshold checks use integer cross-multiplication
  (``hits * 100 >= pct * n_nonnull``) — no float division to disagree on.
* At warehouse scale you profile a sample: ``sample_fraction`` applies a
  seeded Bernoulli sample *before* the aggregate (scan-cheap, and the
  only affordable option on a 100 TB table; hit-RATES converge long
  before 1% of rows).

Patterns reuse :mod:`..operators.scrub`'s Java-regex/RE2 common-subset
patterns so Spark and DuckDB agree byte-for-byte.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scrub import PII_PATTERNS

# --------------------------------------------------------------------------
# Detector + heuristic tables (shared by the Spark path and the oracle)
# --------------------------------------------------------------------------

_UUID_PAT = (
    r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b"
)

# (detector, pattern, suggested rule) in PRECEDENCE order: the first
# detector whose hit-rate clears the threshold wins the suggestion.
# email/ipv4/phone are scrub's proven cross-engine patterns.
CONTENT_DETECTORS: list[tuple[str, str, str]] = [
    next((n, p, "{{faker.email}}") for n, p, _ in PII_PATTERNS if n == "email"),
    ("uuid", _UUID_PAT, "{{faker.uuid}}"),
    next((n, p, "{{faker.ipv4}}") for n, p, _ in PII_PATTERNS if n == "ipv4"),
    next((n, p, "{{faker.phone}}") for n, p, _ in PII_PATTERNS if n == "phone"),
]

# Column-NAME heuristics, applied when no content detector clears the
# threshold. Ordered: first matching substring of the lowercased column
# name wins, so the specific ("first_name") precedes the generic ("name").
# Rules are the reference's faker names (faker.go:11-28).
NAME_HINTS: list[tuple[str, str]] = [
    ("email", "{{faker.email}}"),
    ("first_name", "{{faker.firstName}}"),
    ("firstname", "{{faker.firstName}}"),
    ("last_name", "{{faker.lastName}}"),
    ("lastname", "{{faker.lastName}}"),
    ("surname", "{{faker.lastName}}"),
    ("username", "{{faker.username}}"),
    ("user_name", "{{faker.username}}"),
    ("password", "{{faker.password}}"),
    ("passwd", "{{faker.password}}"),
    ("phone", "{{faker.phone}}"),
    ("address", "{{faker.address}}"),
    ("city", "{{faker.city}}"),
    ("country", "{{faker.country}}"),
    ("company", "{{faker.company}}"),
    ("uuid", "{{faker.uuid}}"),
    ("guid", "{{faker.uuid}}"),
    ("ip_addr", "{{faker.ipv4}}"),
    ("ipaddress", "{{faker.ipv4}}"),
    ("birth", "{{faker.date}}"),
    ("dob", "{{faker.date}}"),
    ("name", "{{faker.name}}"),
]

#: default threshold: suggest a content rule when >=30% of non-null
#: values match the detector. Integer percent so both engines compare
#: with exact integer arithmetic.
DEFAULT_THRESHOLD_PCT = 30


# --------------------------------------------------------------------------
# Profiling: one scan, one 1-row aggregate, JVM-side explode to long form
# --------------------------------------------------------------------------


def profile_pii(
    df: DataFrame,
    table: str,
    columns: list[str] | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Per-(column, detector) PII hit counts for ``table``.

    Returns (table_name, column_name, detector, hits, n_nonnull, n_rows)
    with one row per string column per content detector. One aggregation
    over one scan regardless of how many detectors/columns are profiled.
    """
    if columns is None:
        columns = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    if not columns:
        raise ValueError(f"no string columns to profile in table {table!r}")
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=42)

    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in columns:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__nn_{c}"))
        for det, pat, _ in CONTENT_DETECTORS:
            aggs.append(
                F.sum(
                    F.when(F.regexp_like(F.col(c), F.lit(pat)), F.lit(1)).otherwise(0)
                )
                .cast("long")
                .alias(f"__h_{c}_{det}")
            )
    wide = df.groupBy().agg(*aggs)

    entries = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.lit(det).alias("detector"),
            F.col(f"__h_{c}_{det}").alias("hits"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
        )
        for c in columns
        for det, _, _ in CONTENT_DETECTORS
    ]
    return wide.select(
        F.lit(table).alias("table_name"),
        F.explode(F.array(*entries)).alias("e"),
        F.col("n_rows"),
    ).select(
        "table_name",
        F.col("e.column_name").alias("column_name"),
        F.col("e.detector").alias("detector"),
        F.col("e.hits").alias("hits"),
        F.col("e.n_nonnull").alias("n_nonnull"),
        "n_rows",
    )


def profile_pii_duck_sql(
    table_expr: str, table_name: str, columns: list[str]
) -> str:
    """DuckDB oracle for :func:`profile_pii` (no sampling): UNION ALL of
    per-(column, detector) filtered counts, all from one logical scan."""
    parts = []
    for c in columns:
        for det, pat, _ in CONTENT_DETECTORS:
            parts.append(
                f"SELECT '{table_name}' AS table_name, '{c}' AS column_name, "
                f"'{det}' AS detector, "
                f"CAST(count(*) FILTER (WHERE regexp_matches({c}, '{pat}')) AS BIGINT) AS hits, "
                f"CAST(count({c}) AS BIGINT) AS n_nonnull, "
                f"CAST(count(*) AS BIGINT) AS n_rows "
                f"FROM {table_expr}"
            )
    return " UNION ALL ".join(parts)


# --------------------------------------------------------------------------
# Suggestion: deterministic rule choice over the tiny profile relation
# --------------------------------------------------------------------------


def suggest_rules(
    profile: DataFrame, threshold_pct: int = DEFAULT_THRESHOLD_PCT
) -> DataFrame:
    """Turn a :func:`profile_pii` relation into per-column rule
    suggestions: (table_name, column_name, suggested_rule, evidence).

    Content evidence wins (first detector in ``CONTENT_DETECTORS`` order
    whose integer hit-rate >= ``threshold_pct``); otherwise the first
    matching ``NAME_HINTS`` substring; otherwise NULL rule (column looks
    clean). Pure DataFrame ops over the already-tiny profile — the input
    table is NOT rescanned.
    """
    per_det = [
        F.max(F.when(F.col("detector") == det, F.col("hits"))).alias(f"__h_{det}")
        for det, _, _ in CONTENT_DETECTORS
    ]
    g = profile.groupBy("table_name", "column_name").agg(
        F.max("n_nonnull").alias("__nn"), *per_det
    )

    rule: Column = F.lit(None).cast("string")
    evidence: Column = F.lit(None).cast("string")
    # build the WHEN chain in reverse so earlier detectors take precedence
    lowered = F.lower(F.col("column_name"))
    for frag, hint_rule in reversed(NAME_HINTS):
        cond = lowered.contains(frag)
        rule = F.when(cond, F.lit(hint_rule)).otherwise(rule)
        evidence = F.when(cond, F.lit(f"name~{frag}")).otherwise(evidence)
    for det, _, det_rule in reversed(CONTENT_DETECTORS):
        cond = (F.col(f"__h_{det}") * 100 >= F.lit(threshold_pct) * F.col("__nn")) & (
            F.col("__nn") > 0
        )
        rule = F.when(cond, F.lit(det_rule)).otherwise(rule)
        evidence = F.when(cond, F.lit(f"content:{det}")).otherwise(evidence)

    return g.select(
        "table_name",
        "column_name",
        rule.alias("suggested_rule"),
        evidence.alias("evidence"),
    )


def suggest_rules_duck_sql(
    profile_sql: str, threshold_pct: int = DEFAULT_THRESHOLD_PCT
) -> str:
    """DuckDB oracle for :func:`suggest_rules` over a profile subquery,
    generated from the SAME constant tables so precedence is identical."""
    per_det = ", ".join(
        f"max(CASE WHEN detector = '{det}' THEN hits END) AS h_{det}"
        for det, _, _ in CONTENT_DETECTORS
    )
    content_whens = " ".join(
        f"WHEN h_{det} * 100 >= {threshold_pct} * nn AND nn > 0 THEN '{rule}'"
        for det, _, rule in CONTENT_DETECTORS
    )
    content_ev = " ".join(
        f"WHEN h_{det} * 100 >= {threshold_pct} * nn AND nn > 0 THEN 'content:{det}'"
        for det, _, _ in CONTENT_DETECTORS
    )
    name_whens = " ".join(
        f"WHEN contains(lower(column_name), '{frag}') THEN '{rule}'"
        for frag, rule in NAME_HINTS
    )
    name_ev = " ".join(
        f"WHEN contains(lower(column_name), '{frag}') THEN 'name~{frag}'"
        for frag, _ in NAME_HINTS
    )
    return (
        "SELECT table_name, column_name, "
        f"CASE {content_whens} {name_whens} ELSE NULL END AS suggested_rule, "
        f"CASE {content_ev} {name_ev} ELSE NULL END AS evidence "
        "FROM (SELECT table_name, column_name, max(n_nonnull) AS nn, "
        f"{per_det} FROM ({profile_sql}) GROUP BY table_name, column_name)"
    )
