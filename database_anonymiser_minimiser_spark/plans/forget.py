"""Relational subject erasure: FK-closure DELETE script generation.

The reference's purpose is removing subjects from relational data
(anonymiser.go masks them; exporter.go subsets them); this plan closes
the loop for the right-to-erasure request a DBA actually receives:
"delete these subjects EVERYWHERE" — the subject's rows plus every row
transitively referencing them through the FK graph (orders of the
customer, lineitems of those orders, events of the user), emitted as a
dialect-aware SQL DELETE script that applies cleanly to the live
database the dump came from.

Shape:
- the closure is expressed as NESTED ``IN (SELECT ...)`` predicates
  keyed ONLY by the root ids — no data is collected to build the
  script, so a subject with a million lineitems emits the same few
  statements as one with ten. The same ANSI predicate text runs in
  three engines: Spark SQL for the dry-run counts (planned as semi
  joins — distributed, scale-honest), DuckDB in the test cross-check,
  and the target dialect in the emitted script,
- statements run CHILDREN FIRST (reverse FK-topo order), so every
  subquery's referenced table is still intact when it is evaluated and
  FK constraints hold at every point of the script — no need to
  disable checks,
- root id lists chunk at ``chunk`` ids per statement pass (the
  reference's 1000-row batching, exporter.go:72-80); each chunk is a
  complete children-first pass so integrity holds between chunks,
- a FK cycle among the affected tables cannot be ordered children-first
  and is refused loudly (the same cycle the topo sort's fallback
  tolerates for CREATE order is NOT safe for deletes).

Multi-path closure is an OR of edge predicates: forgetting a nation
hits lineitem through orders→customer AND through supplier, and both
arms appear in lineitem's predicate.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..dump import format_value, quote_ident

# literal root-id lists above this size belong in a staging table, not
# a WHERE clause — refuse loudly rather than emit an unusable script
MAX_ROOT_IDS = 10_000


@dataclass
class TableDelete:
    table: str
    predicate: str  # ANSI predicate over quoted identifiers
    n_rows: int | None = None  # filled by the dry-run count
    n_before: int | None = None  # table total, same dry-run scan (r15)


def _quote_preds(db_type: str):
    def q(ident: str) -> str:
        return quote_ident(db_type, ident)

    return q


def build_forget_plan(
    source,
    root_table: str,
    key_col: str,
    ids: list,
    db_type: str = "mysql",
) -> "list[TableDelete]":
    """The affected tables in CHILDREN-FIRST order, each with its
    closure predicate (root ids inlined as SQL literals)."""
    if not ids:
        raise ValueError("forget: no ids given")
    if len(ids) > MAX_ROOT_IDS:
        raise ValueError(
            f"forget: {len(ids)} root ids exceeds {MAX_ROOT_IDS}; stage "
            "the id list as a table and subset-export instead"
        )
    tables = set(source.get_tables())
    if root_table not in tables:
        raise ValueError(
            f"forget: unknown table {root_table!r} (catalog has "
            f"{', '.join(sorted(tables))})"
        )
    cols = {c.name for c in source.get_columns(root_table)}
    if key_col not in cols:
        raise ValueError(
            f"forget: table {root_table!r} has no column {key_col!r}"
        )
    fks = [
        fk
        for fk in source.get_foreign_keys()
        if fk.table in tables and fk.referenced_table in tables
    ]
    children: dict = {}
    for fk in fks:
        children.setdefault(fk.referenced_table, []).append(fk)

    q = _quote_preds(db_type)
    id_list = ", ".join(format_value(v) for v in ids)
    preds: dict = {root_table: f"{q(key_col)} IN ({id_list})"}

    # descend the FK graph from the root; a cycle among affected tables
    # cannot be deleted children-first, refuse before emitting anything
    in_progress: set = set()

    def visit(parent: str) -> None:
        if parent in in_progress:
            raise ValueError(
                f"forget: FK cycle through {parent!r} — children-first "
                "delete order does not exist; break the cycle manually"
            )
        in_progress.add(parent)
        for fk in children.get(parent, ()):
            arm = (
                f"{q(fk.column)} IN (SELECT {q(fk.referenced_column)} "
                f"FROM {q(parent)} WHERE {preds[parent]})"
            )
            if fk.table in preds:
                if arm not in preds[fk.table]:
                    preds[fk.table] = f"{preds[fk.table]} OR {arm}"
                    visit(fk.table)  # new arm may reach new descendants
            else:
                preds[fk.table] = arm
                visit(fk.table)
        in_progress.discard(parent)

    visit(root_table)

    # children first: reverse FK-topo over the affected subgraph
    from .topo import sort_tables_by_dependency

    ordered = sort_tables_by_dependency(sorted(preds), fks)
    return [TableDelete(t, preds[t]) for t in reversed(ordered)]


def count_forget_plan(
    spark, source, root_table: str, key_col: str, ids: list
) -> "list[TableDelete]":
    """The dry-run: build the plan in BACKTICK quoting (MySQL's — which
    Spark SQL parses natively, so the counted predicate is literally the
    script text) and run each table's predicate through Spark SQL, where
    the nested IN-subqueries plan as distributed semi joins. Every table
    a predicate references is itself an affected ancestor, so the plan's
    own table set is exactly the views needed."""
    plan = build_forget_plan(source, root_table, key_col, ids, "mysql")
    for td in plan:
        source.read(td.table).createOrReplaceTempView(td.table)
    for td in plan:
        # ONE scan yields the closure count AND the table total (r15:
        # apply_forget_parquet previously re-scanned each table for
        # `before`; count_if(pred) counts exactly the rows a
        # WHERE pred would keep — NULL/false both excluded)
        row = spark.sql(
            f"SELECT count_if(({td.predicate})) AS n, count(*) AS total "
            f"FROM `{td.table}`"
        ).first()
        td.n_rows = int(row["n"])
        td.n_before = int(row["total"])
    return plan


def apply_forget_parquet(
    spark, source, root_table: str, key_col: str, ids: list, out: str
) -> "list[TableDelete]":
    """The LAKE half of relational erasure: rewrite every affected
    table MINUS its closure rows as parquet under ``out/<table>`` —
    what a takedown does to an exported dataset (the SQL script's job
    on the live database). Untouched tables are not rewritten; swap the
    written datasets over their originals.

    Keep-predicate NULL semantics matter: a NULL foreign key makes the
    closure predicate NULL (``NULL IN (...)``), and a bare ``NOT pred``
    would silently DROP those rows — rows that reference nobody and
    must survive. The keep filter is ``NOT COALESCE(pred, FALSE)``.
    Row accounting is verified per table: kept == before − deleted."""
    plan = count_forget_plan(spark, source, root_table, key_col, ids)
    for td in plan:
        # before-count rides the dry-run scan (see count_forget_plan);
        # the kept == before − deleted accounting check is unchanged
        before = td.n_before
        kept = spark.sql(
            f"SELECT * FROM `{td.table}` "
            f"WHERE NOT COALESCE(({td.predicate}), FALSE)"
        )
        dest = f"{out}/{td.table}"
        kept.write.mode("error").parquet(dest)
        n_out = spark.read.parquet(dest).count()
        if n_out != before - td.n_rows:
            raise RuntimeError(
                f"forget parquet rewrite mismatch for {td.table}: "
                f"{before} before, {td.n_rows} deleted, {n_out} written"
            )
    return plan


def render_forget_script(
    source,
    root_table: str,
    key_col: str,
    ids: list,
    db_type: str = "mysql",
    chunk: int = 1000,
) -> str:
    """The full DELETE script: one children-first pass per root-id
    chunk, wrapped in a transaction. Subqueries evaluate against
    still-intact parents, so FK constraints hold mid-script."""
    begin = {
        "mysql": "START TRANSACTION;",
        "postgres": "BEGIN;",
        "sqlite": "BEGIN TRANSACTION;",
    }.get(db_type, "BEGIN;")
    lines = [
        "-- Subject erasure script",
        "-- Generated by dbmask-spark",
        f"-- Root: {root_table}.{key_col} ({len(ids)} id(s)), "
        f"dialect: {db_type}",
        "-- Children-first FK-closure deletes; referenced tables stay",
        "-- intact until their own statement, so constraints hold.",
        "",
        begin,
    ]
    for i in range(0, len(ids), max(1, int(chunk))):
        part = ids[i : i + max(1, int(chunk))]
        plan = build_forget_plan(
            source, root_table, key_col, part, db_type
        )
        if len(ids) > chunk:
            lines.append(f"-- chunk {i // chunk + 1}")
        for td in plan:
            lines.append(
                f"DELETE FROM {quote_ident(db_type, td.table)} "
                f"WHERE {td.predicate};"
            )
    lines.append("COMMIT;")
    lines.append("")
    return "\n".join(lines)
