"""Free-text PII redaction — masking *inside* document bodies.

The reference anonymises whole columns (``internal/anonymiser/anonymiser.go:34-101``);
a training-data pipeline additionally needs to redact PII embedded in free
text (emails, IP addresses, phone numbers inside ``documents.text``). This
operator extends the same rule idea to substring granularity.

Everything is JVM-side ``regexp_replace`` / ``regexp_count`` — whole-stage
codegen, linear in input splits, no shuffle, no Python in the data path.
The patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB) so the DuckDB oracle is bit-identical: character classes,
bounded repetition and ``\\b`` word boundaries only — no backrefs or
lookaround.

At 100 TB this is the ideal operator shape: a narrow map over the scan
with every filter/projection pushed down; throughput is bounded by scan
bandwidth, not CPU.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in this order on both engines.
# Patterns use Java-regex/RE2 common syntax only.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone numbers in ``text_col``.

    Returns (id, scrubbed, n_email, n_ipv4, n_phone). Counts are taken on
    the original text; replacements are applied in PII_PATTERNS order so
    overlapping matches resolve identically on every engine.
    """
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = text
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), scrubbed.alias("scrubbed"), *counts)


def scrub_pii_expr(text: F.Column) -> F.Column:
    """The scrubbed-text expression alone — for composing into other
    pipelines (curate --scrub-pii) without restructuring their columns,
    mirroring textstats.strip_markup_expr."""
    scrubbed = text
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed


def duck_scrub_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`scrub_pii` over the same input expression."""
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrubbed = text_expr
    for _, pat, repl in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    return f"SELECT {id_expr}, {scrubbed} AS scrubbed, {counts}"
