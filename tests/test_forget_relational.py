"""Relational subject erasure (forget --table): FK-closure DELETE
scripts. The gates: closure counts equal DuckDB running the identical
predicate text, statements run children-first, multi-path closures OR
every arm, and — the end-state check — the script APPLIES to a real
SQLite database built from the engine's own dump, after which the
subjects are gone, every transitively-referencing row is gone, nothing
else changed, and referential integrity still holds.
"""

import sqlite3
import subprocess
import sys

import duckdb
import pytest

from database_anonymiser_minimiser_spark.plans.forget import (
    build_forget_plan,
    count_forget_plan,
    render_forget_script,
)
from database_anonymiser_minimiser_spark.sources.parquet import (
    ForeignKey,
    ParquetSource,
)

SF = "/root/testdata/sf0.001"


def _duck_con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_forget_plan_counts_match_duckdb(spark):
    src = ParquetSource(spark, SF)
    plan = count_forget_plan(spark, src, "customer", "c_custkey", [1, 7])
    got = {td.table: td.n_rows for td in plan}
    con = _duck_con()
    want = {}
    for td in plan:
        # the IDENTICAL predicate text (double-quote dialect) in DuckDB
        pred = build_forget_plan(
            src, "customer", "c_custkey", [1, 7], "postgres"
        )
        pd = next(x for x in pred if x.table == td.table)
        want[td.table] = con.execute(
            f'SELECT count(*) FROM "{td.table}" WHERE {pd.predicate}'
        ).fetchone()[0]
    assert got == want and got["customer"] == 2
    # children strictly before every table they reference
    order = [td.table for td in plan]
    assert order.index("lineitem") < order.index("orders")
    assert order.index("orders") < order.index("customer")
    assert order.index("events") < order.index("customer")


def test_forget_multipath_or(spark):
    """Root = nation: lineitem is reached through orders→customer AND
    through supplier — its predicate must OR both arms, and the count
    must equal DuckDB's on the same text."""
    src = ParquetSource(spark, SF)
    plan = build_forget_plan(src, "nation", "n_nationkey", [3], "postgres")
    li = next(td for td in plan if td.table == "lineitem")
    assert "l_orderkey" in li.predicate and "l_suppkey" in li.predicate
    assert " OR " in li.predicate
    counted = count_forget_plan(spark, src, "nation", "n_nationkey", [3])
    con = _duck_con()
    for td in counted:
        pd = next(x for x in plan if x.table == td.table)
        want = con.execute(
            f'SELECT count(*) FROM "{td.table}" WHERE {pd.predicate}'
        ).fetchone()[0]
        assert td.n_rows == want, td.table
    # supplier and customer both affected, lineitem before both
    order = [td.table for td in counted]
    for child, parent in [
        ("lineitem", "supplier"),
        ("lineitem", "orders"),
        ("orders", "customer"),
        ("customer", "nation"),
        ("supplier", "nation"),
    ]:
        assert order.index(child) < order.index(parent), order


@pytest.mark.slow  # r15 full-tier (scale/fuzz/e2e twin; see conftest)
def test_forget_script_applies_to_sqlite_dump(tmp_path):
    """End-state: dump the corpus with the engine (sqlite dialect),
    import into a real SQLite database WITH foreign keys enforced,
    apply the generated erasure script, and verify: subjects gone,
    closure gone, everything else untouched, integrity clean."""
    dump = tmp_path / "dump.sql"
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: %s}\n"
        "configuration:\n  customer: {primary_key: c_custkey}\n" % SF
    )
    r = subprocess.run(
        [sys.executable, "-m", "database_anonymiser_minimiser_spark.cli",
         "-c", str(cfg), "--dialect", "sqlite", "-o", str(dump)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    erase = tmp_path / "erase.sql"
    r = subprocess.run(
        [sys.executable, "-m", "database_anonymiser_minimiser_spark.cli",
         "-c", str(cfg), "--dialect", "sqlite", "-o", str(erase),
         "forget", "--table", "customer", "--ids", "1,7"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DELETE lineitem: 72 row(s)" in r.stdout
    assert "DELETE customer: 2 row(s)" in r.stdout

    db = sqlite3.connect(":memory:")
    db.executescript(dump.read_text())
    before = {
        t: db.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        for t in ("customer", "orders", "lineitem", "events", "nation",
                  "supplier", "part")
    }
    db.executescript(erase.read_text())
    after = {
        t: db.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        for t in before
    }
    assert after["customer"] == before["customer"] - 2
    assert after["orders"] == before["orders"] - 16
    assert after["lineitem"] == before["lineitem"] - 72
    assert after["events"] == before["events"] - 126
    # untouched tables untouched
    for t in ("nation", "supplier", "part"):
        assert after[t] == before[t], t
    # the subjects and their closure are really gone
    assert db.execute(
        "SELECT count(*) FROM customer WHERE c_custkey IN (1,7)"
    ).fetchone()[0] == 0
    assert db.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IN (1,7)"
    ).fetchone()[0] == 0
    # referential integrity: no orphaned lineitem/order/event rows
    for child, fk, parent, pk in [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]:
        orphans = db.execute(
            f"SELECT count(*) FROM {child} WHERE {fk} NOT IN "
            f"(SELECT {pk} FROM {parent})"
        ).fetchone()[0]
        assert orphans == 0, (child, orphans)


def test_forget_script_chunking(spark, tmp_path):
    """chunk=1: one complete children-first pass per root id; applying
    the chunked script equals the single-pass script."""
    src = ParquetSource(spark, SF)
    one = render_forget_script(
        src, "customer", "c_custkey", [1, 7], "sqlite", chunk=1000
    )
    chunked = render_forget_script(
        src, "customer", "c_custkey", [1, 7], "sqlite", chunk=1
    )
    assert one.count("DELETE FROM") == 4
    assert chunked.count("DELETE FROM") == 8
    assert chunked.count("-- chunk") == 2
    # both scripts reach the same end state on the dumped database
    for script in (one, chunked):
        db = sqlite3.connect(":memory:")
        for t in ("customer", "orders", "lineitem", "events"):
            rows = _duck_con().execute(f"SELECT * FROM {t}").fetchall()
            cols = _duck_con().execute(
                f"SELECT * FROM {t} LIMIT 0"
            ).description
            names = ", ".join(c[0] for c in cols)
            db.execute(
                f"CREATE TABLE {t} ({names})"
            )
            db.executemany(
                f"INSERT INTO {t} VALUES ({', '.join('?' * len(cols))})",
                [tuple(str(v) if not isinstance(v, (int, float, type(None)))
                       else v for v in row) for row in rows],
            )
        db.executescript(script)
        assert db.execute(
            "SELECT count(*) FROM lineitem"
        ).fetchone()[0] == 6000 - 72


class _StubSource:
    def __init__(self, tables, cols, fks):
        self._tables, self._cols, self._fks = tables, cols, fks

    def get_tables(self):
        return self._tables

    def get_columns(self, table):
        class C:  # ColumnInfo shape
            def __init__(self, name):
                self.name = name

        return [C(c) for c in self._cols[table]]

    def get_foreign_keys(self):
        return self._fks


def test_forget_refusals(spark):
    src = ParquetSource(spark, SF)
    with pytest.raises(ValueError, match="unknown table"):
        build_forget_plan(src, "nope", "x", [1])
    with pytest.raises(ValueError, match="no column"):
        build_forget_plan(src, "customer", "nope", [1])
    with pytest.raises(ValueError, match="no ids"):
        build_forget_plan(src, "customer", "c_custkey", [])
    with pytest.raises(ValueError, match="exceeds"):
        build_forget_plan(src, "customer", "c_custkey", list(range(10001)))
    # FK cycle among affected tables -> loud refusal, no partial script
    cyc = _StubSource(
        ["a", "b"],
        {"a": ["id", "b_ref"], "b": ["id", "a_ref"]},
        [ForeignKey("a", "b_ref", "b", "id"),
         ForeignKey("b", "a_ref", "a", "id")],
    )
    with pytest.raises(ValueError, match="cycle"):
        build_forget_plan(cyc, "a", "id", [1])


def test_cli_forget_relational_errors(tmp_path, capsys):
    from database_anonymiser_minimiser_spark import cli

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: %s}\nconfiguration: {}\n" % SF
    )
    rc = cli.main(
        ["-c", str(cfg), "forget", "--table", "customer", "--ids", "1"]
    )
    _, err = capsys.readouterr()
    assert rc == 2 and "no key column" in err
    rc = cli.main(
        ["-c", str(cfg), "--dry-run", "forget", "--table", "customer",
         "--key", "c_custkey", "--ids", "1"]
    )
    out, _ = capsys.readouterr()
    assert rc == 0 and "DELETE customer: 1 row(s)" in out
    # neither mode's required args -> friendly error
    rc = cli.main(["forget", "--ids", "1"])
    _, err = capsys.readouterr()
    assert rc == 2 and "--table" in err


def test_apply_forget_parquet(spark, tmp_path):
    """The lake half: affected tables rewritten minus their closure,
    accounting verified, untouched tables not written."""
    from database_anonymiser_minimiser_spark.plans.forget import (
        apply_forget_parquet,
    )

    src = ParquetSource(spark, SF)
    out = str(tmp_path / "erased")
    plan = apply_forget_parquet(
        spark, src, "customer", "c_custkey", [1, 7], out
    )
    import os

    assert sorted(os.listdir(out)) == sorted(
        td.table for td in plan
    )  # only affected tables written
    li = spark.read.parquet(f"{out}/lineitem")
    assert li.count() == 6000 - 72
    cust = spark.read.parquet(f"{out}/customer")
    assert cust.filter("c_custkey IN (1, 7)").count() == 0
    ords = spark.read.parquet(f"{out}/orders")
    assert ords.filter("o_custkey IN (1, 7)").count() == 0


def test_apply_forget_parquet_null_fk_survives(spark, tmp_path):
    """A NULL foreign key makes the closure predicate NULL; those rows
    reference nobody and MUST survive the rewrite — the bare NOT(pred)
    trap."""
    import json

    base = tmp_path / "corpus"
    base.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    ).write.parquet(str(base / "parent.parquet"))
    spark.createDataFrame(
        [(10, 1), (11, 2), (12, None)], "cid bigint, pid bigint"
    ).write.parquet(str(base / "child.parquet"))
    (base / "foreign_keys.json").write_text(json.dumps([
        {"table": "child", "column": "pid",
         "referenced_table": "parent", "referenced_column": "id"}
    ]))
    from database_anonymiser_minimiser_spark.plans.forget import (
        apply_forget_parquet,
    )

    src = ParquetSource(spark, str(base))
    out = str(tmp_path / "erased")
    apply_forget_parquet(spark, src, "parent", "id", [1], out)
    kept = {
        r["cid"] for r in spark.read.parquet(f"{out}/child").collect()
    }
    assert kept == {11, 12}  # 10 erased; the NULL-fk row 12 SURVIVES


def test_cli_forget_mixed_modes_refused(tmp_path, capsys):
    from database_anonymiser_minimiser_spark import cli

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "connection: {type: parquet, path: %s}\nconfiguration: {}\n" % SF
    )
    rc = cli.main(
        ["-c", str(cfg), "forget", "--table", "customer",
         "--key", "c_custkey", "--index", "ann", "--path", "/tmp/x",
         "--ids", "1"]
    )
    _, err = capsys.readouterr()
    assert rc == 2 and "separate invocations" in err
