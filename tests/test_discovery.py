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
    CONTENT_DETECTORS,
    DEFAULT_THRESHOLD_PCT,
    NAME_HINTS,
    profile_pii,
    suggest_rules,
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

    corpus = tmp_path / "lake"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "uid": [1, 2, 3],
                "contact": ["a@x.io", "b@y.io", "c@z.io"],
                "city_name": ["Leeds", "York", "Hull"],
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

    merged = config_mod.load(str(out_cfg))
    cols = merged.configuration["users"].columns
    assert cols["contact"] == "{{faker.email}}"  # discovered
    assert cols["city_name"] == "REDACTED"  # user rule untouched

    # closure: export WITH the merged config — discovered rule must mask
    # to generated emails, never to the template literal or the original
    dump = tmp_path / "dump.sql"
    assert cli.main(["-c", str(out_cfg), "-o", str(dump)]) == 0
    text = dump.read_text()
    assert "{{faker.email}}" not in text and "a@x.io" not in text
    masked = re.findall(r"'([^']+@[^']+)'", text)
    assert len(masked) == 3  # three rows, each a generated email
