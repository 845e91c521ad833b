"""Connected-components clustering over planted pair graphs with known
components (chains, isolated nodes, merging clusters)."""

import pytest

from database_anonymiser_minimiser_spark.operators.dedup import connected_components


def cc(spark, pair_list, id_list):
    pairs = spark.createDataFrame(pair_list, ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in id_list], ["id"])
    return {
        r["id"]: r["cluster_id"] for r in connected_components(pairs, ids).collect()
    }


def test_chain_collapses_to_one_cluster(spark):
    # 0-1, 1-2, 2-3: transitive chain, min id 0 everywhere
    got = cc(spark, [(0, 1), (1, 2), (2, 3)], [0, 1, 2, 3, 9])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 9}  # 9 isolated


def test_two_components(spark):
    got = cc(spark, [(1, 2), (5, 6), (6, 7)], [1, 2, 5, 6, 7])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5}


def test_long_chain_converges(spark):
    # diameter 10 chain: needs multiple propagation rounds
    n = 10
    got = cc(spark, [(i, i + 1) for i in range(n)], list(range(n + 1)))
    assert set(got.values()) == {0}


def test_empty_pairs_all_singletons(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs, ids).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
