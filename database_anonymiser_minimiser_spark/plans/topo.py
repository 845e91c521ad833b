"""FK-dependency topological sort — driver-side, metadata only.

Reproduces the reference's semantics (``internal/schema/schema.go:62-166``):

- build a dependency graph table -> tables it references, skipping
  self-references and FKs to tables not in the input set,
- Kahn's algorithm with a FIFO queue so referenced tables sort before
  referencing ones,
- cycle tolerance: leftover (cyclic) tables are appended at the end in
  input order rather than raising.

This never touches data: the graph has #tables nodes and only constrains
the ORDER in which table sections are committed to the dump sink. Table
*computation* stays independent and can run as parallel Spark jobs
(unlike the reference's strictly sequential loop, exporter.go:72-80).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass


@dataclass(frozen=True)
class ForeignKey:
    """One FK edge (internal/database/driver.go:18-24)."""

    table: str
    column: str
    referenced_table: str
    referenced_column: str


def build_dependency_graph(
    tables: list[str], foreign_keys: list[ForeignKey]
) -> dict[str, list[str]]:
    """table -> list of tables it references (schema.go:62-98).

    Self-references are skipped and FKs pointing at tables outside
    ``tables`` are ignored (schema.go:507-574 edge-case semantics).
    """
    present = set(tables)
    graph: dict[str, list[str]] = {t: [] for t in tables}
    for fk in foreign_keys:
        if fk.table not in present or fk.referenced_table not in present:
            continue
        if fk.table == fk.referenced_table:
            continue
        if fk.referenced_table not in graph[fk.table]:
            graph[fk.table].append(fk.referenced_table)
    return graph


def sort_tables_by_dependency(
    tables: list[str], foreign_keys: list[ForeignKey]
) -> list[str]:
    """Kahn topo sort with FIFO queue + cycle fallback (schema.go:101-166).

    Referenced tables come first. On a cycle, every table still appears:
    un-emitted tables are appended in input order (schema.go:149-163).
    """
    graph = build_dependency_graph(tables, foreign_keys)

    # in-degree = number of (present) tables this table references; a table
    # with in-degree 0 references nothing and can be emitted immediately.
    in_degree = {t: len(graph[t]) for t in tables}
    # reverse adjacency: referenced table -> tables that reference it
    dependents: dict[str, list[str]] = {t: [] for t in tables}
    for t in tables:
        for ref in graph[t]:
            dependents[ref].append(t)

    queue = deque(t for t in tables if in_degree[t] == 0)
    ordered: list[str] = []
    while queue:
        t = queue.popleft()
        ordered.append(t)
        for dep in dependents[t]:
            in_degree[dep] -= 1
            if in_degree[dep] == 0:
                queue.append(dep)

    if len(ordered) < len(tables):  # cycle: append leftovers, never fail
        emitted = set(ordered)
        ordered.extend(t for t in tables if t not in emitted)
    return ordered
