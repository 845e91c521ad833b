"""FK topo-sort semantics — behavioral spec from the reference's
``internal/schema/schema_test.go:223-420, 507-574`` (linear chain, complex,
diamond, self-reference, cycle tolerance, FK-to-missing-table)."""

from database_anonymiser_minimiser_spark.plans.topo import (
    ForeignKey,
    build_dependency_graph,
    sort_tables_by_dependency,
)


def fk(t, rt):
    return ForeignKey(t, f"{t}_col", rt, "id")


def test_no_dependencies_keeps_order():
    assert sort_tables_by_dependency(["b", "a", "c"], []) == ["b", "a", "c"]


def test_linear_chain():
    order = sort_tables_by_dependency(["orders", "users"], [fk("orders", "users")])
    assert order.index("users") < order.index("orders")


def test_complex_chain():
    tables = ["order_items", "orders", "products", "users"]
    fks = [
        fk("orders", "users"),
        fk("order_items", "orders"),
        fk("order_items", "products"),
    ]
    order = sort_tables_by_dependency(tables, fks)
    assert order.index("users") < order.index("orders")
    assert order.index("orders") < order.index("order_items")
    assert order.index("products") < order.index("order_items")


def test_diamond():
    fks = [fk("b", "a"), fk("c", "a"), fk("d", "b"), fk("d", "c")]
    order = sort_tables_by_dependency(["d", "c", "b", "a"], fks)
    assert order.index("a") < order.index("b")
    assert order.index("a") < order.index("c")
    assert order.index("b") < order.index("d")
    assert order.index("c") < order.index("d")


def test_self_reference_skipped():
    order = sort_tables_by_dependency(["employees"], [fk("employees", "employees")])
    assert order == ["employees"]


def test_cycle_tolerated_all_tables_present():
    order = sort_tables_by_dependency(["a", "b", "c"], [fk("a", "b"), fk("b", "a")])
    assert sorted(order) == ["a", "b", "c"]
    assert order[0] == "c"  # the acyclic table sorts first


def test_fk_to_missing_table_ignored():
    graph = build_dependency_graph(["a"], [fk("a", "ghost")])
    assert graph == {"a": []}
    assert sort_tables_by_dependency(["a"], [fk("a", "ghost")]) == ["a"]


def test_duplicate_edges_collapse():
    fks = [fk("orders", "users"), fk("orders", "users")]
    graph = build_dependency_graph(["orders", "users"], fks)
    assert graph["orders"] == ["users"]


def test_property_random_dags_valid_order():
    """Hypothesis: for ANY random edge set, the output (a) contains every
    table exactly once, and (b) respects every edge that is part of an
    acyclic component (referenced before referencing)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = [f"t{i}" for i in range(8)]

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(names), st.sampled_from(names)),
            max_size=20,
        )
    )
    def run(edges):
        fks = [fk(a, b) for a, b in edges]
        order = sort_tables_by_dependency(list(names), fks)
        assert sorted(order) == sorted(names)  # permutation, always
        pos = {t: i for i, t in enumerate(order)}
        # edges whose endpoints are NOT in any cycle must be respected;
        # detect cycle membership via iterated graph pruning (Kahn on the
        # full graph): tables left over are cyclic
        graph = build_dependency_graph(list(names), fks)
        in_deg = {t: len(graph[t]) for t in names}
        dependents = {t: [] for t in names}
        for t in names:
            for r in graph[t]:
                dependents[r].append(t)
        queue = [t for t in names if in_deg[t] == 0]
        emitted = set()
        while queue:
            t = queue.pop()
            emitted.add(t)
            for d in dependents[t]:
                in_deg[d] -= 1
                if in_deg[d] == 0:
                    queue.append(d)
        for a, b in edges:  # a references b -> b first (acyclic part only)
            if a != b and a in emitted and b in emitted:
                assert pos[b] < pos[a], (a, b, order)

    run()


def test_testdata_corpus_order():
    from database_anonymiser_minimiser_spark.sources.parquet import (
        TESTDATA_FOREIGN_KEYS,
    )

    tables = [
        "customer", "documents", "embeddings", "events", "lineitem",
        "nation", "orders", "part", "region", "supplier",
    ]
    order = sort_tables_by_dependency(tables, TESTDATA_FOREIGN_KEYS)
    assert order.index("region") < order.index("nation")
    assert order.index("nation") < order.index("customer")
    assert order.index("customer") < order.index("orders")
    assert order.index("orders") < order.index("lineitem")
    assert order.index("part") < order.index("lineitem")
    assert order.index("supplier") < order.index("lineitem")
    assert order.index("customer") < order.index("events")
