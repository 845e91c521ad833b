"""Anonymise operator: apply compiled column rules to a DataFrame.

Spark-first replacement for the reference's row loop
(``internal/anonymiser/anonymiser.go:34-101``, called per row from
``exporter.go:231``): instead of copying each row map and mutating
configured columns, we emit ONE projection with rule expressions
substituted for configured columns. Catalyst collapses it into the scan
projection — the whole transform stays inside WholeStageCodegen with zero
Python in the data path.

Semantics preserved from the reference:
- columns configured but absent from the table are skipped silently
  (anonymiser.go:45-48; anonymiser_test.go "missing column skipped"),
- unconfigured columns pass through unchanged,
- value consistency ("same original -> same fake, across tables",
  anonymiser_test.go:174-204) holds because rules are deterministic
  functions of the original value — no consistency map / mutex needed
  (anonymiser.go:19-23 scales poorly; see SURVEY.md section 7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import TableConfig
from ..functions.rules import CompiledRule, RuleKind, compile_rules


def anonymise(df: DataFrame, table_config: TableConfig) -> DataFrame:
    """Apply ``table_config.columns`` rules; stable column order (P1)."""
    return apply_rules(df, compile_rules(table_config))


def apply_rules(df: DataFrame, rules: list[CompiledRule]) -> DataFrame:
    by_col = {
        r.column: r
        for r in rules
        if r.kind is not RuleKind.UNKNOWN_FAKER  # unchanged, like reference
    }
    if not by_col:
        return df
    # one explicit stable-ordered projection (reference keeps catalog
    # ordinal order, mysql.go:140-153)
    exprs = [
        (by_col[c].spark_column(df).alias(c) if c in by_col else df[f"`{c}`"])
        for c in df.columns
    ]
    return df.select(*exprs)
