"""DP release ledger (operators/privacy_ledger.py + the CLI ``release``
verb): epsilon accounting across releases, the refusal/warning rules,
and the emitted manifest."""

import json
import warnings as W

import pytest

from database_anonymiser_minimiser_spark.operators.privacy_ledger import (
    DPBudgetError,
    DPLedger,
    DPReleaseWarning,
    ReleaseSpec,
    parse_releases,
)


def _spec(**kw):
    base = dict(
        name="r1",
        table="orders",
        kind="count",
        group_by=("o_orderstatus",),
        epsilon=1.0,
        seed="s1",
    )
    base.update(kw)
    return ReleaseSpec(**base)


def test_ledger_plain_releases_accumulate():
    led = DPLedger()
    assert led.record(_spec()) == 1.0
    assert led.record(_spec(name="r2", table="events", seed="s2",
                            group_by=("event_type",))) == 1.0
    assert led.total_epsilon == 2.0
    m = led.manifest()
    assert m["total_epsilon"] == 2.0
    assert len(m["releases"]) == 2
    assert all(r["adjacency"] == "row" for r in m["releases"])


def test_ledger_avg_spends_double():
    """avg composes a sum and a count release (privacy.py:dp_noisy_avg
    documents the 2*epsilon accounting) — the ledger must charge it."""
    led = DPLedger()
    charged = led.record(
        _spec(kind="avg", value="o_totalprice", bound=1000, epsilon=0.5)
    )
    assert charged == 1.0


def test_ledger_identical_rerelease_is_free_with_warning():
    led = DPLedger()
    led.record(_spec())
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        charged = led.record(_spec(name="dup"))
    assert charged == 0.0
    assert led.total_epsilon == 1.0
    assert any(w.category is DPReleaseWarning for w in caught)
    assert "spends no additional budget" in str(caught[0].message)


def test_ledger_fresh_seed_rerelease_accumulates_with_warning():
    """The documented averaging attack: fresh noise over the same
    statistic. Legal (sequential composition) but the epsilon ADDS and
    the ledger says so."""
    led = DPLedger()
    led.record(_spec())
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        charged = led.record(_spec(name="again", seed="s2"))
    assert charged == 1.0
    assert led.total_epsilon == 2.0
    msgs = [str(w.message) for w in caught
            if w.category is DPReleaseWarning]
    assert any("averaging attack" in m and "totals 2" in m for m in msgs)


def test_ledger_refuses_same_seed_different_epsilon():
    """Same relation + same seed + different epsilon: both noise values
    derive from ONE uniform draw through different breakpoint tables —
    publishing both lets a reader difference the releases. Refused."""
    led = DPLedger()
    led.record(_spec())
    with pytest.raises(DPBudgetError, match="SAME seed"):
        led.record(_spec(name="bad", epsilon=2.0))


def test_ledger_warns_on_cross_relation_seed_reuse():
    """A count and a sum grouped identically with one seed draw
    IDENTICAL noise for overlapping group values (the noise key is
    (group value, seed)) — warned, not refused."""
    led = DPLedger()
    led.record(_spec())
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        led.record(
            _spec(name="sum_side", kind="sum", value="o_totalprice",
                  bound=1000)
        )
    msgs = [str(w.message) for w in caught
            if w.category is DPReleaseWarning]
    assert any("reuses seed" in m for m in msgs)
    assert led.total_epsilon == 2.0  # still charged — legal, just risky


def test_parse_releases_validation():
    ok = parse_releases(
        {
            "releases": [
                {"name": "a", "table": "orders", "kind": "count",
                 "group_by": "o_orderstatus", "epsilon": 1, "seed": "s"},
            ]
        }
    )
    assert ok[0].group_by == ("o_orderstatus",)
    for bad, match in [
        ({"releases": []}, "non-empty"),
        ({"releases": [{"table": "t", "kind": "count",
                        "group_by": ["g"], "seed": "s",
                        "epsilon": -1}]}, "positive"),
        ({"releases": [{"table": "t", "kind": "nope",
                        "group_by": ["g"], "seed": "s"}]}, "kind"),
        ({"releases": [{"table": "t", "kind": "count",
                        "group_by": ["g"]}]}, "seed"),
        ({"releases": [{"table": "t", "kind": "sum",
                        "group_by": ["g"], "seed": "s",
                        "value": "v"}]}, "bound"),
        ({"releases": [{"table": "t", "kind": "user_count",
                        "group_by": ["g"], "seed": "s"}]}, "entity"),
        ({"releases": [{"table": "t", "kind": "sum", "value": "v",
                        "bound": 5, "group_by": ["g"], "seed": "s",
                        "domain": ["a"]}]}, "kind: count"),
    ]:
        with pytest.raises(DPBudgetError, match=match):
            parse_releases(bad)


def test_config_load_validates_privacy_block(tmp_path):
    """A bad privacy block fails at config LOAD (friendly ConfigError),
    before any Spark work — like every other config mistake."""
    from database_anonymiser_minimiser_spark import config as config_mod

    cfg = tmp_path / "bad.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
        "    - {table: orders, kind: count, group_by: [o_orderstatus]}\n"
    )
    with pytest.raises(config_mod.ConfigError, match="seed"):
        config_mod.load(cfg)


def test_release_cli_e2e(spark, tmp_path, capsys):
    """The verdict's 'done' bar: manifest emitted by the CLI; the
    released values equal the operator called directly (deterministic
    seeded release); epsilon totals reflect the accumulation warning."""
    from database_anonymiser_minimiser_spark.cli import main
    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_count,
    )
    from database_anonymiser_minimiser_spark.sources.parquet import (
        read_parquet_table,
    )

    cfg = tmp_path / "rel.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
        "    - {name: status_counts, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: aug-a}\n"
        "    - {name: status_counts_again, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: aug-b}\n"
        "    - {name: user_events, table: events, kind: user_count,\n"
        "       group_by: [event_type], entity: user_id,\n"
        "       epsilon: 1.0, seed: aug-c}\n"
    )
    manifest_path = tmp_path / "manifest.json"
    rc = main(["-c", str(cfg), "release", "--manifest", str(manifest_path)])
    out, err = capsys.readouterr()
    assert rc == 0
    assert "averaging attack" in err  # fresh-seed re-release warned
    m = json.loads(manifest_path.read_text())
    assert m["total_epsilon"] == 3.0
    rel = m["relations"]["orders/count/o_orderstatus"]
    assert rel["epsilon_spent"] == 2.0
    assert m["relations"]["events/user_count/event_type"]["adjacency"] == "user"
    assert [r["seed"] for r in m["releases"]] == ["aug-a", "aug-b", "aug-c"]
    # printed values match the operator called directly (seeded release)
    orders = read_parquet_table(
        spark, "/root/testdata/sf0.001/orders.parquet"
    )
    want = {
        str(r["o_orderstatus"]): str(r["noisy_count"])
        for r in dp_noisy_count(
            orders, ["o_orderstatus"], epsilon=1.0, seed="aug-a"
        ).collect()
    }
    section = out.split("== status_counts:")[1].split("==")[0]
    got = dict(
        line.split("\t")
        for line in section.strip().splitlines()[2:]
    )
    assert got == want


def test_release_histogram_bin_width(spark, tmp_path, capsys):
    """kind: count + bin_width releases a DP histogram: the released
    key is the PUBLIC bin identity, optionally densified by a domain
    list; values match the operator composition called directly."""
    import warnings as W

    from database_anonymiser_minimiser_spark.cli import main
    from database_anonymiser_minimiser_spark.operators.privacy_ledger import (
        DPLedger,
        ReleaseSpec,
        parse_releases,
    )

    # parse validation: bin_width only for count, one column
    with pytest.raises(DPBudgetError, match="kind: count"):
        parse_releases(
            {"releases": [{"table": "t", "kind": "sum", "value": "v",
                           "bound": 5, "group_by": ["g"], "seed": "s",
                           "bin_width": 10}]}
        )
    # binned and unbinned counts of the same column are DIFFERENT
    # relations (no false accumulation warning)
    led = DPLedger()
    led.record(_spec(group_by=("value",)))
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        led.record(
            _spec(name="hist", group_by=("value",), bin_width=50,
                  seed="s9")
        )
    assert not any(
        w.category is DPReleaseWarning for w in caught
    ), [str(w.message) for w in caught]
    m = led.manifest()
    assert "orders/count/value:bin50" in m["relations"]
    assert m["engine_version"]

    cfg = tmp_path / "hist.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
        "    - {name: value_hist, table: events, kind: count,\n"
        "       group_by: [value], bin_width: 50,\n"
        "       domain: [0, 50, 100, 150, 200, 250, 300, 350, 400,\n"
        "                450, 500],\n"
        "       epsilon: 1.0, seed: hist-a}\n"
    )
    manifest_path = tmp_path / "hist_manifest.json"
    rc = main(["-c", str(cfg), "release", "--manifest", str(manifest_path)])
    out, _ = capsys.readouterr()
    assert rc == 0
    m = json.loads(manifest_path.read_text())
    assert m["releases"][0]["bin_width"] == 50
    assert m["releases"][0]["domain_size"] == 11
    # the equivalent registered query is the oracle-gated twin
    from database_anonymiser_minimiser_spark.queries import QUERIES

    want = {
        str(r["value_bin"]): str(r["noisy_count"])
        for r in QUERIES["privacy_dp_histogram"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    section = out.split("== value_hist:")[1].split("==")[0]
    got = dict(
        line.split("\t") for line in section.strip().splitlines()[2:]
    )
    # same bins released (the CLI uses seed hist-a vs the query's
    # default seed, so counts differ; the DENSIFIED key set must match)
    assert set(got) == set(want)
    assert len(got) == 11


def test_release_manifest_cumulative_across_runs(tmp_path, capsys):
    """An existing --manifest is loaded before accounting, so the
    across-INVOCATION patterns are caught: an identical re-run spends
    nothing (warned), a fresh-seed re-run accumulates the relation's
    total, and a same-seed different-epsilon re-run is refused against
    history."""
    from database_anonymiser_minimiser_spark.cli import main

    base = (
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
    )
    rel = (
        "    - {{name: r, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: {eps}, seed: {seed}}}\n"
    )
    cfg1 = tmp_path / "run1.yaml"
    cfg1.write_text(base + rel.format(eps="1.0", seed="week1"))
    manifest = tmp_path / "cum.json"
    assert main(["-c", str(cfg1), "release", "--manifest", str(manifest)]) == 0
    capsys.readouterr()
    assert json.loads(manifest.read_text())["total_epsilon"] == 1.0

    # identical re-run: free, warned, total unchanged
    assert main(["-c", str(cfg1), "release", "--manifest", str(manifest)]) == 0
    err = capsys.readouterr().err
    assert "loaded 1 prior release(s)" in err
    assert "spends no additional budget" in err
    assert json.loads(manifest.read_text())["total_epsilon"] == 1.0

    # fresh seed next week: accumulates with the averaging warning
    cfg2 = tmp_path / "run2.yaml"
    cfg2.write_text(base + rel.format(eps="1.0", seed="week2"))
    assert main(["-c", str(cfg2), "release", "--manifest", str(manifest)]) == 0
    err = capsys.readouterr().err
    assert "averaging attack" in err and "totals 2" in err
    m = json.loads(manifest.read_text())
    # history: week1 (1.0) + identical re-run (0.0) + week2 (1.0)
    assert m["total_epsilon"] == 2.0
    assert m["relations"]["orders/count/o_orderstatus"]["epsilon_spent"] == 2.0

    # same seed, different epsilon vs HISTORY: refused, manifest intact
    cfg3 = tmp_path / "run3.yaml"
    cfg3.write_text(base + rel.format(eps="2.0", seed="week1"))
    assert main(["-c", str(cfg3), "release", "--manifest", str(manifest)]) == 2
    err = capsys.readouterr().err
    assert "SAME seed" in err
    assert json.loads(manifest.read_text()) == m  # not overwritten


def test_privacy_audit_cli(tmp_path, capsys):
    """config privacy.audit entries run inside the audit verb as extra
    PASS/FAIL rows: k-anonymity over a quasi combination, l-diversity
    and t-closeness with a sensitive column; an unsatisfiable k fails
    the audit (exit 1) with the observed worst value."""
    from database_anonymiser_minimiser_spark.cli import main

    base = (
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
    )
    ok = tmp_path / "aud_ok.yaml"
    ok.write_text(
        base
        + "privacy:\n  audit:\n"
        "    - {table: customer, quasi: [c_nationkey], k: 1,\n"
        "       sensitive: c_mktsegment, l: 1, t: 0.999}\n"
    )
    assert main(["-c", str(ok), "audit"]) == 0
    out = capsys.readouterr().out
    assert "PASS  customer: k_anonymity(quasi=c_nationkey, k=1)" in out
    assert "l_diversity" in out and "t_closeness" in out

    bad = tmp_path / "aud_bad.yaml"
    bad.write_text(
        base
        + "privacy:\n  audit:\n"
        "    - {table: customer, quasi: [c_nationkey, c_mktsegment],\n"
        "       k: 1000}\n"
    )
    assert main(["-c", str(bad), "audit"]) == 1
    out = capsys.readouterr().out
    assert "FAIL  customer: k_anonymity(quasi=c_nationkey,c_mktsegment, k=1000)" in out

    # load-time validation: l without sensitive is a friendly ConfigError
    from database_anonymiser_minimiser_spark import config as config_mod

    broken = tmp_path / "aud_broken.yaml"
    broken.write_text(
        base + "privacy:\n  audit:\n"
        "    - {table: customer, quasi: [c_nationkey], l: 2}\n"
    )
    with pytest.raises(config_mod.ConfigError, match="sensitive"):
        config_mod.load(broken)
    empty = tmp_path / "aud_empty.yaml"
    empty.write_text(base + "privacy: {audit: []}\n")
    with pytest.raises(config_mod.ConfigError, match="releases.*audit"):
        config_mod.load(empty)


def test_release_cli_refuses_correlated_noise(tmp_path, capsys):
    """Same relation + same seed + different epsilon: exit 2 with the
    differencing explanation, and NO release rows printed (a partial
    print would itself be a release)."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "bad_rel.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
        "    - {name: a, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: s}\n"
        "    - {name: b, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 2.0, seed: s}\n"
    )
    rc = main(["-c", str(cfg), "release"])
    out, err = capsys.readouterr()
    assert rc == 2
    assert "SAME seed" in err
    assert "==" not in out  # nothing released


def test_release_manifest_committed_before_failing_release(tmp_path, capsys):
    """r12 ADVICE (medium): a typo'd column in a LATER spec raises
    AnalysisException mid-loop AFTER earlier releases were printed —
    their epsilon must already be persisted, or the next invocation
    silently undercounts spent budget. The manifest is now written
    BEFORE any release output; a failed print over-counts (privacy-safe
    direction), never the reverse."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "rel.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
        "    - {name: ok, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: pre-a}\n"
        "    - {name: typo, table: orders, kind: count,\n"
        "       group_by: [no_such_column], epsilon: 2.0, seed: pre-b}\n"
    )
    manifest_path = tmp_path / "manifest.json"
    with pytest.raises(Exception):  # AnalysisException mid-loop
        main(["-c", str(cfg), "release", "--manifest", str(manifest_path)])
    out, err = capsys.readouterr()
    assert "== ok:" in out  # first release WAS printed before the crash
    assert manifest_path.exists(), "manifest must pre-commit the budget"
    m = json.loads(manifest_path.read_text())
    # BOTH specs' epsilon recorded, including the one that failed to run
    assert m["total_epsilon"] == 3.0
    assert [r["seed"] for r in m["releases"]] == ["pre-a", "pre-b"]
    # and a follow-up invocation preloads the full 3.0
    cfg2 = tmp_path / "rel2.yaml"
    cfg2.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  releases:\n"
        "    - {name: again, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: pre-c}\n"
    )
    rc = main(["-c", str(cfg2), "release", "--manifest", str(manifest_path)])
    out, err = capsys.readouterr()
    assert rc == 0
    assert "epsilon already spent: 3" in err
    assert json.loads(manifest_path.read_text())["total_epsilon"] == 4.0


def test_release_audit_only_privacy_block_clean_error(tmp_path, capsys):
    """r12 ADVICE (low): a privacy block with only an 'audit' list is
    valid at load, but the release verb must take the clean error /
    return-2 path, not an uncaught DPBudgetError traceback."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "auditonly.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {}\n"
        "privacy:\n  audit:\n"
        "    - {table: orders, quasi: [o_orderstatus], k: 2}\n"
    )
    rc = main(["-c", str(cfg), "release"])
    out, err = capsys.readouterr()
    assert rc == 2
    assert "error:" in err and "releases" in err


@pytest.mark.slow  # r15 full-tier (scale/fuzz/e2e twin; see conftest)
def test_export_plus_release_one_run_one_manifest(spark, tmp_path, capsys):
    """r12 verdict item 4: ONE config drives the masked export AND the
    DP releases in ONE run, under ONE ledger-enforced manifest covering
    both (the reference's single export entry point, main.go:80-199,
    extended with the privacy counterpart)."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "both.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration:\n"
        "  customer:\n"
        "    primary_key: c_custkey\n"
        "    columns: {c_name: '{{faker.name}}'}\n"
        "  orders: {primary_key: o_orderkey}\n"
        "privacy:\n  releases:\n"
        "    - {name: status_counts, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: xr-a}\n"
    )
    dump = tmp_path / "dump.sql"
    manifest_path = tmp_path / "manifest.json"
    rc = main(
        ["-c", str(cfg), "-o", str(dump), "--manifest", str(manifest_path)]
    )
    out, err = capsys.readouterr()
    assert rc == 0
    # the masked export happened
    text = dump.read_text()
    assert "INSERT INTO `customer`" in text
    assert "INSERT INTO `orders`" in text
    # the release was printed to stdout (the dump went to the file)
    assert "== status_counts: count of orders" in out
    # ONE manifest covering both halves
    m = json.loads(manifest_path.read_text())
    assert m["total_epsilon"] == 1.0
    assert m["releases"][0]["seed"] == "xr-a"
    assert m["export"]["format"] == "sql"
    # all 10 source tables export (unconfigured ones pass through,
    # reference behaviour)
    assert m["export"]["tables_exported"] == 10
    assert m["export"]["per_table_rows"]["orders"] == 1500
    # a SECOND combined run preloads the history: identical re-release
    # is free and warned, cumulative total unchanged
    rc = main(
        ["-c", str(cfg), "-o", str(dump), "--manifest", str(manifest_path)]
    )
    out, err = capsys.readouterr()
    assert rc == 0
    assert "identical re-release" in err
    m2 = json.loads(manifest_path.read_text())
    assert m2["total_epsilon"] == 1.0
    assert len(m2["releases"]) == 2  # history + the free re-release


def test_export_with_releases_requires_manifest_and_output(tmp_path, capsys):
    """Gates: a releases-bearing config refuses to export without
    --manifest (unrecorded epsilon) or without -o (released statistics
    would interleave with the dump on stdout). Accounting refusals fail
    BEFORE the export runs."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "both.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {orders: {}}\n"
        "privacy:\n  releases:\n"
        "    - {name: a, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: g-a}\n"
        "    - {name: b, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 2.0, seed: g-a}\n"
    )
    dump = tmp_path / "dump.sql"
    rc = main(["-c", str(cfg), "-o", str(dump)])
    _, err = capsys.readouterr()
    assert rc == 2 and "requires --manifest" in err
    manifest_path = tmp_path / "m.json"
    rc = main(["-c", str(cfg), "--manifest", str(manifest_path)])
    _, err = capsys.readouterr()
    assert rc == 2 and "requires -o" in err
    # same-seed different-epsilon is REFUSED at accounting time:
    # nothing exported, no manifest written
    rc = main(
        ["-c", str(cfg), "-o", str(dump), "--manifest", str(manifest_path)]
    )
    _, err = capsys.readouterr()
    assert rc == 2 and "SAME seed" in err
    assert not dump.exists(), "export must not run after a refusal"
    assert not manifest_path.exists()


@pytest.mark.slow  # r15 full-tier (scale/fuzz/e2e twin; see conftest)
def test_contracts_recorded_in_export_manifest(spark, tmp_path, capsys):
    """r14 (r13 verdict item 7): a config with BOTH privacy.releases and
    a quality block records contract outcomes in the SAME manifest as
    export stats and DP accounting — the quality gate ships with the
    artifact it gated. A contracts-only config (no releases) still gets
    a manifest (zero-epsilon ledger shell), and the audit verb appends
    its outcomes to an existing manifest without clobbering it."""
    from database_anonymiser_minimiser_spark.cli import main

    cfg = tmp_path / "all.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration:\n"
        "  customer:\n"
        "    primary_key: c_custkey\n"
        "    columns: {c_name: '{{faker.name}}'}\n"
        "  orders: {primary_key: o_orderkey}\n"
        "privacy:\n  releases:\n"
        "    - {name: status_counts, table: orders, kind: count,\n"
        "       group_by: [o_orderstatus], epsilon: 1.0, seed: qc-a}\n"
        "quality:\n"
        "  orders:\n"
        "    - {check: complete, column: o_orderkey}\n"
        "    - {check: in_range, column: o_totalprice, lo: 0, hi: 1}\n"
    )
    dump = tmp_path / "dump.sql"
    manifest_path = tmp_path / "manifest.json"
    rc = main(
        ["-c", str(cfg), "-o", str(dump), "--manifest", str(manifest_path)]
    )
    out, err = capsys.readouterr()
    assert rc == 0
    assert "contract FAIL  orders: in_range" in err  # surfaced, not fatal
    assert "contracts: 1/2 passed (recorded in manifest)" in err
    m = json.loads(manifest_path.read_text())
    # one manifest, three ledgers: epsilon, export, contracts
    assert m["total_epsilon"] == 1.0
    assert m["export"]["tables_exported"] == 10
    assert m["contracts_passed"] is False
    by_c = {c["constraint"]: c for c in m["contracts"]}
    assert by_c["complete(o_orderkey)"]["passed"] is True
    assert by_c["in_range(o_totalprice,0.0,1.0)"]["passed"] is False
    assert by_c["in_range(o_totalprice,0.0,1.0)"]["observed"] == 1500

    # contracts-only config: manifest still written (epsilon 0 shell)
    cfg2 = tmp_path / "conly.yaml"
    cfg2.write_text(
        "connection: {type: parquet, path: /root/testdata/sf0.001}\n"
        "configuration: {orders: {primary_key: o_orderkey}}\n"
        "quality:\n"
        "  orders:\n"
        "    - {check: min_rows, n: 100}\n"
    )
    m2_path = tmp_path / "m2.json"
    rc = main(
        ["-c", str(cfg2), "-o", str(tmp_path / "d2.sql"),
         "--manifest", str(m2_path)]
    )
    capsys.readouterr()
    assert rc == 0
    m2 = json.loads(m2_path.read_text())
    assert m2["total_epsilon"] == 0
    assert m2["contracts_passed"] is True
    assert m2["export"]["per_table_rows"]["orders"] == 1500

    # audit verb appends to the EXISTING combined manifest
    rc = main(
        ["-c", str(cfg), "--manifest", str(manifest_path), "audit"]
    )
    out, err = capsys.readouterr()
    assert rc == 1  # the absurd range still fails
    assert "audit outcomes recorded" in err
    m3 = json.loads(manifest_path.read_text())
    assert m3["total_epsilon"] == 1.0  # release record survived
    assert m3["export"]["tables_exported"] == 10  # export record survived
    assert m3["contracts_passed"] is False
    # audit's rows include PK/FK audit AND the contract rows
    cons = {c["constraint"] for c in m3["contracts"]}
    assert "in_range(o_totalprice,0.0,1.0)" in cons
    assert any("complete" in c or "unique" in c for c in cons)
