"""Anonymisation rule language: null | static literal | {{faker.<fn>}}.

Reproduces the reference's per-column rule semantics
(``internal/anonymiser/anonymiser.go:34-101``):

- ``null`` (YAML null), the literal string ``"null"``, or ``""`` -> SQL
  NULL (anonymiser.go:50-54: ``rule == "null" || rule == ""``),
- ``{{faker.<name>}}`` -> generated fake value; template grammar is the
  exact regex ``\\{\\{faker\\.(\\w+)\\}\\}`` (anonymiser.go:10-13) — partial
  or malformed templates fall through to static literals
  (anonymiser_test.go:368-395),
- any other string -> static literal replacement (anonymiser.go:94-97).

Rules compile at plan time (driver-side) into pure Column expressions; the
faker path is deterministic-keyed so cross-table consistency needs no
shared state (see functions/faker_deterministic.py).

Unknown faker names warn at validation time but do not fail — and the
masked value becomes the EMPTY STRING, exactly as the reference:
GenerateFakeValue returns "" for unknown names (faker.go:45-52) and
anonymiser.go:84-92 writes that "" into the row. A config typo must
never fall through to the original value — that would silently export
the PII the rule was meant to mask.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import FAKER_TEMPLATE_RE, TableConfig
from .faker_deterministic import FAKER_FUNCTIONS, FakerSpec, get_faker


class RuleKind(Enum):
    NULL = "null"
    STATIC = "static"
    FAKER = "faker"
    UNKNOWN_FAKER = "unknown_faker"  # warn-only; masks to "" (faker.go:45-52)
    ENCRYPT = "encrypt"  # extension: reversible pseudonymization


#: extension template (not in the reference): ``{{encrypt}}`` = random-IV
#: GCM, ``{{encrypt.deterministic}}`` = ECB (same value -> same token,
#: FK-join-preserving; equality leak documented in operators/privacy.py).
#: The key comes from the DBMASK_ENCRYPT_KEY env var — never the config.
ENCRYPT_TEMPLATE_RE = re.compile(r"^\{\{encrypt(\.deterministic)?\}\}$")


@dataclass(frozen=True)
class CompiledRule:
    column: str
    kind: RuleKind
    static_value: str = ""
    faker: FakerSpec | None = None
    encrypt_deterministic: bool = False

    def spark_column(self, df: DataFrame) -> Column:
        """Column expression replacing ``self.column`` in ``df``."""
        if self.kind is RuleKind.NULL:
            # preserve original type (reference emits NULL whatever the type)
            return F.lit(None).cast(df.schema[self.column].dataType)
        if self.kind is RuleKind.STATIC:
            return F.lit(self.static_value)
        if self.kind is RuleKind.FAKER:
            assert self.faker is not None
            return self.faker.spark_column(self.column)
        if self.kind is RuleKind.ENCRYPT:
            import os

            from ..operators.privacy import pseudonymize_column

            key = os.environ.get("DBMASK_ENCRYPT_KEY", "")
            # AES key sizes are BYTE lengths — measure the UTF-8
            # encoding, not Python characters (a 16-char key containing
            # non-ASCII is NOT a valid AES-128 key)
            key_bytes = len(key.encode("utf-8"))
            if key_bytes not in (16, 24, 32):
                # fail CLOSED at plan time: exporting with a missing or
                # malformed key would either leak the plaintext or write
                # undecryptable tokens — both unacceptable silently
                raise ValueError(
                    "{{encrypt}} rule needs DBMASK_ENCRYPT_KEY set to a "
                    "16/24/32-byte AES key (got "
                    f"{key_bytes} UTF-8 bytes)"
                )
            return pseudonymize_column(
                self.column, key, deterministic=self.encrypt_deterministic
            )
        # unknown faker: empty string, NEVER the original (faker.go:45-52 +
        # anonymiser.go:84-92 — a typo'd template must not leak the PII)
        return F.lit("")

    def duckdb_sql(self) -> str:
        """Oracle-side SQL for the same replacement (DuckDB dialect)."""
        q = f'"{self.column}"'
        if self.kind is RuleKind.NULL:
            return "NULL"
        if self.kind is RuleKind.STATIC:
            escaped = self.static_value.replace("'", "''")
            return f"'{escaped}'"
        if self.kind is RuleKind.FAKER:
            assert self.faker is not None
            return self.faker.sql("duckdb", q)
        if self.kind is RuleKind.ENCRYPT:
            # no cross-engine oracle: DuckDB has no aes_encrypt; the gate
            # is the roundtrip + mode unit suite (test_rules.py,
            # test_privacy.py) — callers building oracles must not use
            # encrypt rules in oracle-keyed queries
            raise NotImplementedError(
                "{{encrypt}} has no DuckDB oracle (aes_encrypt is "
                "Spark-side); verified by roundtrip unit tests instead"
            )
        return "''"  # unknown faker: empty string (see spark_column)


def parse_rule(column: str, raw: Any) -> CompiledRule:
    """Classify one rule value (anonymiser.go:44-97). The literal string
    "null" is a NULL rule too (anonymiser.go:51: ``rule == "null"``) — a
    JSON config or quoted YAML value "null" must not emit the static
    string 'null'."""
    if raw is None or raw == "" or raw == "null":
        return CompiledRule(column, RuleKind.NULL)
    value = str(raw)
    enc = ENCRYPT_TEMPLATE_RE.match(value)
    if enc:
        return CompiledRule(
            column,
            RuleKind.ENCRYPT,
            encrypt_deterministic=enc.group(1) is not None,
        )
    m = FAKER_TEMPLATE_RE.match(value)
    if m:
        spec = get_faker(m.group(1))
        if spec is None:
            return CompiledRule(column, RuleKind.UNKNOWN_FAKER, static_value=value)
        return CompiledRule(column, RuleKind.FAKER, faker=spec)
    return CompiledRule(column, RuleKind.STATIC, static_value=value)


def compile_rules(table_config: TableConfig) -> list[CompiledRule]:
    return [parse_rule(c, v) for c, v in table_config.columns.items()]


def validate_rules(configuration: dict[str, TableConfig]) -> list[str]:
    """Warn-only validation of faker template names (anonymiser.go:167-189).

    Returns human-readable warnings for every ``{{faker.X}}`` rule whose X
    is not in the registry; never raises.
    """
    warnings: list[str] = []
    for table, tc in configuration.items():
        for column, raw in tc.columns.items():
            if raw is None or raw == "":
                continue
            m = FAKER_TEMPLATE_RE.match(str(raw))
            if m and m.group(1) not in FAKER_FUNCTIONS:
                warnings.append(
                    f"unknown faker function '{m.group(1)}' for "
                    f"{table}.{column} (available: "
                    f"{', '.join(sorted(FAKER_FUNCTIONS))})"
                )
    return warnings
