"""Rule-language parsing spec — from the reference's
``internal/anonymiser/anonymiser_test.go`` (rule classification, template
grammar negatives ``:368-395``, warn-only unknown fakers ``:167-189``) and
``faker_test.go:39-62`` (registry completeness)."""

from database_anonymiser_minimiser_spark.config import TableConfig
from database_anonymiser_minimiser_spark.functions.faker_deterministic import (
    FAKER_FUNCTIONS,
    get_faker,
    list_faker_functions,
)
from database_anonymiser_minimiser_spark.functions.rules import (
    RuleKind,
    parse_rule,
    validate_rules,
)

REFERENCE_FAKERS = [
    "name", "firstName", "lastName", "email", "phone", "address", "city",
    "country", "company", "uuid", "username", "password", "ipv4", "date",
    "text", "number",
]


def test_registry_completeness():
    # the reference registers exactly these 16 (faker.go:11-28)
    assert sorted(REFERENCE_FAKERS) == list_faker_functions()
    assert len(FAKER_FUNCTIONS) == 16
    assert get_faker("nope") is None


def test_null_rules():
    assert parse_rule("c", None).kind is RuleKind.NULL
    assert parse_rule("c", "").kind is RuleKind.NULL


def test_static_rule():
    r = parse_rule("c", "REDACTED")
    assert r.kind is RuleKind.STATIC and r.static_value == "REDACTED"


def test_faker_rule():
    r = parse_rule("c", "{{faker.email}}")
    assert r.kind is RuleKind.FAKER and r.faker.name == "email"


def test_malformed_templates_are_static():
    # anonymiser_test.go:368-395: partial/malformed templates -> literal
    for raw in (
        "{{faker.email",
        "faker.email}}",
        "{faker.email}",
        "{{faker.}}",
        "{{notfaker.email}}",
        "x{{faker.email}}",
        "{{faker.email}}x",
    ):
        assert parse_rule("c", raw).kind is RuleKind.STATIC, raw


def test_unknown_faker_is_warn_only():
    r = parse_rule("c", "{{faker.nonexistent}}")
    assert r.kind is RuleKind.UNKNOWN_FAKER
    warnings = validate_rules(
        {"t": TableConfig(columns={"c": "{{faker.nonexistent}}", "d": "static"})}
    )
    assert len(warnings) == 1 and "nonexistent" in warnings[0]
    assert validate_rules({"t": TableConfig(columns={"c": "{{faker.email}}"})}) == []


def test_duckdb_sql_rendering():
    r = parse_rule("c_name", "{{faker.email}}")
    sql = r.duckdb_sql()
    assert "md5" in sql and '"c_name"' in sql
    assert parse_rule("c", None).duckdb_sql() == "NULL"
    assert parse_rule("c", "O'Brien").duckdb_sql() == "'O''Brien'"


def test_null_string_rule_is_null():
    """anonymiser.go:51: rule == "null" (the literal string, e.g. from a
    JSON config or quoted YAML) is a NULL rule, not the static 'null'."""
    assert parse_rule("c", "null").kind is RuleKind.NULL
    assert parse_rule("c", "NULL").kind is RuleKind.STATIC  # case-sensitive
    assert parse_rule("c", "null").duckdb_sql() == "NULL"


def test_unknown_faker_masks_to_empty_string(spark):
    """faker.go:45-52 + anonymiser.go:84-92: unknown faker names mask to
    "" — the original value must NEVER leak through a typo'd template."""
    from pyspark.sql import Row

    r = parse_rule("c", "{{faker.emial}}")  # typo'd 'email'
    assert r.kind is RuleKind.UNKNOWN_FAKER
    assert r.duckdb_sql() == "''"
    df = spark.createDataFrame([Row(c="SECRET-PII")])
    out = df.select(r.spark_column(df).alias("c")).collect()
    assert out[0]["c"] == ""


# --- {{encrypt}} extension rules -------------------------------------------


def test_encrypt_rule_roundtrips_through_anonymise(spark, monkeypatch):
    """A {{encrypt.deterministic}} column rule must produce decryptable
    tokens and preserve the same-value-same-token join property; plain
    {{encrypt}} (GCM) must randomise tokens for equal values."""
    from database_anonymiser_minimiser_spark.config import TableConfig
    from database_anonymiser_minimiser_spark.operators.anonymise import (
        anonymise,
    )
    from database_anonymiser_minimiser_spark.operators.privacy import (
        depseudonymize_column,
    )

    monkeypatch.setenv("DBMASK_ENCRYPT_KEY", "0123456789abcdef")
    df = spark.createDataFrame(
        [(1, "alice"), (2, "alice"), (3, "bob")], ["id", "name"]
    )

    det = anonymise(
        df, TableConfig(columns={"name": "{{encrypt.deterministic}}"})
    )
    toks = {r["id"]: r["name"] for r in det.collect()}
    assert toks[1] == toks[2] != toks[3]
    back = det.select(
        "id",
        depseudonymize_column(
            "name", "0123456789abcdef", deterministic=True
        ).alias("plain"),
    ).collect()
    assert {r["id"]: r["plain"] for r in back} == {
        1: "alice", 2: "alice", 3: "bob"
    }

    gcm = anonymise(df, TableConfig(columns={"name": "{{encrypt}}"}))
    gtoks = {r["id"]: r["name"] for r in gcm.collect()}
    assert gtoks[1] != gtoks[2]  # random IV


def test_encrypt_rule_fails_closed_without_key(spark, monkeypatch):
    """Missing/malformed DBMASK_ENCRYPT_KEY must raise at PLAN time —
    silently exporting plaintext (or undecryptable tokens) is the one
    unacceptable outcome."""
    import pytest as _pytest

    from database_anonymiser_minimiser_spark.config import TableConfig
    from database_anonymiser_minimiser_spark.operators.anonymise import (
        anonymise,
    )

    monkeypatch.delenv("DBMASK_ENCRYPT_KEY", raising=False)
    df = spark.createDataFrame([(1, "alice")], ["id", "name"])
    with _pytest.raises(ValueError, match="DBMASK_ENCRYPT_KEY"):
        anonymise(df, TableConfig(columns={"name": "{{encrypt}}"}))


def test_encrypt_rule_is_not_a_static_literal():
    """Template classification: {{encrypt}} and {{encrypt.deterministic}}
    are ENCRYPT rules; near-misses stay static literals (the reference's
    fall-through rule for malformed templates)."""
    from database_anonymiser_minimiser_spark.functions.rules import (
        RuleKind,
        parse_rule,
    )

    assert parse_rule("c", "{{encrypt}}").kind is RuleKind.ENCRYPT
    r = parse_rule("c", "{{encrypt.deterministic}}")
    assert r.kind is RuleKind.ENCRYPT and r.encrypt_deterministic
    assert parse_rule("c", "{{encrypt.gcm}}").kind is RuleKind.STATIC
    assert parse_rule("c", "{{encrypt").kind is RuleKind.STATIC
